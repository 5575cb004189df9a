"""Serving layer: static-shape KV cache + continuous-batching decode engine
(beyond the reference's scope; required by the north star, BASELINE.json)."""

from .engine import ContinuousBatchingEngine, Request, SlotAllocator  # noqa: F401
from .kv_cache import (  # noqa: F401
    KVCacheConfig,
    append_token,
    decode_attention,
    init_kv_cache,
    shard_kv_cache,
)
