"""Multi-chip scaling: device meshes, sharded decode, halo exchange."""

from .sharding import (
    make_mesh,
    decode_sharded,
    decode_sharded_batch,
    decode_sharded_kernel,
    encode_sharded,
    block_decode,
    tbcc_crc_decode_sharded,
    turbo_decode_sharded,
)

__all__ = [
    "make_mesh",
    "decode_sharded",
    "decode_sharded_batch",
    "decode_sharded_kernel",
    "encode_sharded",
    "block_decode",
    "tbcc_crc_decode_sharded",
    "turbo_decode_sharded",
]
