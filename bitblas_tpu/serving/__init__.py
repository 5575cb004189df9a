"""Serving layer: static-shape KV cache + continuous-batching decode engine
(beyond the reference's scope; required by the north star, BASELINE.json)."""

from .engine import (  # noqa: F401
    ContinuousBatchingEngine,
    DataParallelEngineGroup,
    PagedContinuousBatchingEngine,
    Request,
    SlotAllocator,
    TokenContinuousBatchingEngine,
    TokenRequest,
)
from .kv_cache import (  # noqa: F401
    KVCacheConfig,
    append_chunk,
    append_chunk_quant,
    append_token,
    append_token_quant,
    chunk_attention,
    chunk_attention_quant,
    decode_attention,
    decode_attention_quant,
    init_kv_cache,
    init_quant_kv_cache,
    quantize_kv,
    shard_kv_cache,
)
