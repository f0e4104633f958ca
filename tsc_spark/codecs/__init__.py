from .deltadelta import decode_dod, encode_dod
from .gorilla import decode_gorilla, encode_gorilla

__all__ = ["encode_dod", "decode_dod", "encode_gorilla", "decode_gorilla"]
