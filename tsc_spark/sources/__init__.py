from .synth import (
    EDGE_DOCS,
    synth_tokens,
    synth_tokens_distributed,
    synth_tokens_table,
)

__all__ = [
    "EDGE_DOCS",
    "synth_tokens",
    "synth_tokens_distributed",
    "synth_tokens_table",
]
