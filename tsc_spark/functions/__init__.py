from .codec_udfs import (
    decode_floats_udf,
    decode_tokens_table,
    decode_tokens_udf,
    encode_floats_udf,
    encode_tokens_table,
    encode_tokens_udf,
)

__all__ = [
    "encode_tokens_udf",
    "decode_tokens_udf",
    "encode_floats_udf",
    "decode_floats_udf",
    "encode_tokens_table",
    "decode_tokens_table",
]
