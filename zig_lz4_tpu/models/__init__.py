from .codec import (
    BlockCodec,
    FastCodec,
    HCCodec,
    TPUCodec,
    get_codec,
)

__all__ = ["BlockCodec", "FastCodec", "HCCodec", "TPUCodec", "get_codec"]
