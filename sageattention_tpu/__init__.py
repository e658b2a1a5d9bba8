"""sageattention_tpu — TPU-native quantized attention (SageAttention rebuilt
for JAX / Pallas / shard_map).

Public surface mirrors `/root/reference/sageattention/__init__.py:1-5`, plus
TPU-specific entry points and the in-repo sequence-parallel layer the
reference delegates to xDiT.
"""

from .core import (
    sageattn,
    sageattn_qk_int8_pv_bf16,
    sageattn_qk_int8_pv_int8,
    sageattn_qk_int8_pv_fp8,
    sageattn_qk_int8_pv_fp16_triton,
    sageattn_qk_int8_pv_fp16_cuda,
    sageattn_qk_int8_pv_fp8_cuda,
    sageattn_qk_int8_pv_fp8_cuda_sm90,
    flash_attention,
)
from .varlen import sageattn_varlen
from .decode import (
    KVCache,
    kv_cache_init,
    kv_cache_append,
    sageattn_decode,
    decode_bucket,
    kv_cache_trim,
)
from .paged import (
    PagedKVCache,
    PageAllocator,
    build_table,
    paged_prefill,
    paged_append,
    paged_insert,
    paged_trim,
    pages_bucket_for,
    sageattn_decode_paged,
)
from .dispatch import detect as detect_tpu
from .ops.lowbit import sageattn3, sageattn3_blackwell, sageattn3_tiled

__version__ = "2.0.0"

__all__ = [
    "sageattn",
    "sageattn_varlen",
    "sageattn_qk_int8_pv_bf16",
    "sageattn_qk_int8_pv_int8",
    "sageattn_qk_int8_pv_fp8",
    "sageattn_qk_int8_pv_fp16_triton",
    "sageattn_qk_int8_pv_fp16_cuda",
    "sageattn_qk_int8_pv_fp8_cuda",
    "sageattn_qk_int8_pv_fp8_cuda_sm90",
    "flash_attention",
    "KVCache",
    "kv_cache_init",
    "kv_cache_append",
    "sageattn_decode",
    "decode_bucket",
    "kv_cache_trim",
    "PagedKVCache",
    "PageAllocator",
    "build_table",
    "paged_prefill",
    "paged_append",
    "paged_insert",
    "paged_trim",
    "pages_bucket_for",
    "sageattn_decode_paged",
    "detect_tpu",
    "sageattn3",
    "sageattn3_blackwell",
    "sageattn3_tiled",
]
