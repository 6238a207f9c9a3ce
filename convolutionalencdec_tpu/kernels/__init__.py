"""Pallas TPU kernels — the framework's hot compute path.

These are the TPU-native equivalents of the reference's hand-vectorized C
hot loops (viterbiDecoderButterflyk1.c): the batched butterfly ACS forward
pass and the one-hot select-network traceback.
"""

def tpu_kernels_default(spec) -> bool:
    """True when the TPU batch kernels are the right DEFAULT for this
    spec on the current backend (harnesses use the vmapped scan
    otherwise).  The single source of the selection predicate — the
    speed/BER/curve harnesses all consult it.  Note
    `viterbi_decode_batch` itself accepts ANY CodeSpec; this gates
    only the harnesses' kernel-vs-scan default."""
    import jax
    return (jax.default_backend() == "tpu" and spec.k == 1
            and spec.has_poly_symmetry)


from .maxlogmap_pallas import maxlogmap_llrs_batch_kernel  # noqa: E402
from .turbo_pallas import (rsc_maxlogmap_batch_kernel,
                           turbo_decode_batch_kernel,
                           turbo_kernel_supported)
from .acs_k2 import viterbi_decode_batch_k2
from .tailbiting import (viterbi_decode_batch_tailbiting,
                         viterbi_decode_batch_tailbiting_bytes,
                         viterbi_decode_batch_tailbiting_crc,
                         viterbi_decode_batch_tailbiting_crc_soft,
                         viterbi_decode_batch_tailbiting_list,
                         viterbi_decode_batch_tailbiting_punctured_crc,
                         viterbi_decode_batch_tailbiting_ratematched_crc,
                         viterbi_decode_batch_tailbiting_list_soft,
                         viterbi_decode_batch_tailbiting_soft,
                         viterbi_decode_batch_tailbiting_soft_bytes)
from .acs_pallas import (
    viterbi_decode_batch,
    viterbi_decode_batch_soft,
    viterbi_decode_batch_bytes,
    viterbi_decode_batch_soft_bytes,
    viterbi_decode_batch_punctured,
    viterbi_decode_batch_punctured_soft,
    viterbi_decode_batch_ragged,
    viterbi_decode_batch_bytes_ragged,
    viterbi_decode_batch_soft_bytes_ragged,
    viterbi_decode_batch_generic,
    acs_forward_batch,
    acs_forward_batch_soft,
    acs_forward_batch_fused,
    acs_forward_batch_fused_soft,
    traceback_batch_fused,
    traceback_batch_fused_masked,
    traceback_batch,
    stream_decode_batch,
    stream_decode_batch_soft,
    stream_state_init,
)

__all__ = [
    "maxlogmap_llrs_batch_kernel",
    "rsc_maxlogmap_batch_kernel",
    "turbo_decode_batch_kernel",
    "turbo_kernel_supported",
    "viterbi_decode_batch",
    "viterbi_decode_batch_k2",
    "viterbi_decode_batch_tailbiting",
    "viterbi_decode_batch_tailbiting_bytes",
    "viterbi_decode_batch_tailbiting_crc",
    "viterbi_decode_batch_tailbiting_crc_soft",
    "viterbi_decode_batch_tailbiting_list",
    "viterbi_decode_batch_tailbiting_punctured_crc",
    "viterbi_decode_batch_tailbiting_ratematched_crc",
    "viterbi_decode_batch_tailbiting_list_soft",
    "viterbi_decode_batch_tailbiting_soft",
    "viterbi_decode_batch_tailbiting_soft_bytes",
    "viterbi_decode_batch_soft",
    "viterbi_decode_batch_bytes",
    "viterbi_decode_batch_soft_bytes",
    "viterbi_decode_batch_punctured",
    "viterbi_decode_batch_punctured_soft",
    "viterbi_decode_batch_ragged",
    "viterbi_decode_batch_bytes_ragged",
    "viterbi_decode_batch_soft_bytes_ragged",
    "viterbi_decode_batch_generic",
    "acs_forward_batch",
    "acs_forward_batch_soft",
    "acs_forward_batch_fused",
    "acs_forward_batch_fused_soft",
    "traceback_batch_fused",
    "traceback_batch_fused_masked",
    "traceback_batch",
    "stream_decode_batch",
    "stream_decode_batch_soft",
    "stream_state_init",
]
