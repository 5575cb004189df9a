"""FlashAtten vs XLA softmax oracle (reference
testing/python/tilelang/test_tilelang_flash_atten.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bitblas_tpu import FlashAtten, FlashAttenConfig
from bitblas_tpu.testing import assert_close


def run_case(cfg: FlashAttenConfig, seed=0, rtol=2e-2, atol=2e-2):
    op = FlashAtten(cfg, enable_tuning=False)
    Q, K, V = op._example_args()
    got = op.forward(Q, K, V)
    expected = op.ref_program(Q, K, V)
    assert got.shape == expected.shape
    assert_close(got, expected, rtol=rtol, atol=atol)


@pytest.mark.parametrize("causal", [False, True])
def test_basic(causal):
    cfg = FlashAttenConfig(batch=2, heads=4, seq_len=256, dim=64,
                           is_causal=causal)
    run_case(cfg)


def test_gqa():
    cfg = FlashAttenConfig(batch=1, heads=8, kv_heads=2, seq_len=256, dim=64,
                           is_causal=True)
    run_case(cfg)


def test_ntn_layout():
    cfg = FlashAttenConfig(batch=1, heads=2, seq_len=256, dim=64,
                           layout="ntn")
    run_case(cfg)


def test_uneven_blocks():
    cfg = FlashAttenConfig(batch=1, heads=2, seq_len=384, dim=64,
                           is_causal=True)
    run_case(cfg)


@pytest.mark.parametrize("blocks", [(256, 256), (512, 512), (256, 128)])
def test_causal_diag_subchunk(blocks):
    """bq == bkv >= 256 with S % bkv == 0 takes the sub-chunked triangular
    diagonal path (kernels/flash.py use_tri_sub) — narrow static-width dots
    instead of a half-masked full block. Must match the oracle exactly like
    the plain masked path (the (256, 128) case pins the fallback)."""
    from bitblas_tpu.kernels.flash import make_flash_attention
    B, H, S, D = 2, 2, 512, 128
    rng = np.random.default_rng(3)
    Q = jnp.asarray(rng.standard_normal((B, S, H, D)).astype(np.float32))
    K = jnp.asarray(rng.standard_normal((B, S, H, D)).astype(np.float32))
    V = jnp.asarray(rng.standard_normal((B, S, H, D)).astype(np.float32))
    s = jnp.einsum("bqhd,bkhd->bhqk", Q, K) / np.sqrt(D)
    s = jnp.where(jnp.tril(jnp.ones((S, S), bool))[None, None], s, -1e30)
    expected = jnp.einsum("bhqk,bkhd->bqhd", jax.nn.softmax(s, -1), V)
    bq, bkv = blocks
    fn = make_flash_attention(batch=B, heads=H, seq_len=S, dim=D,
                              causal=True, block_q=bq, block_kv=bkv,
                              out_dtype=jnp.float32, interpret=True)
    assert_close(fn(Q, K, V), expected, rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("dim", [64, 96])
def test_small_head_dim_pad_shim(dim):
    """dim % 128 != 0 multi-head no longer raises: the zero-pad shim
    (kernels/flash.py) pads d to the next lane multiple with an exact
    scale override instead of handing the shape to the 7.5 TF/s XLA
    fallback. Construction must succeed even for the non-interpret path
    (the Mosaic layout sees dim_p), and the padded math must equal the
    oracle at the TRUE 1/sqrt(dim) scale."""
    from bitblas_tpu.kernels.flash import make_flash_attention
    B, H, S = 1, 4, 256
    # non-interpret construction (no call): the old guard raised here
    make_flash_attention(batch=B, heads=H, seq_len=S, dim=dim, causal=True,
                         interpret=False)
    rng = np.random.default_rng(11)
    Q = jnp.asarray(rng.standard_normal((B, S, H, dim)).astype(np.float32))
    K = jnp.asarray(rng.standard_normal((B, S, H, dim)).astype(np.float32))
    V = jnp.asarray(rng.standard_normal((B, S, H, dim)).astype(np.float32))
    s = jnp.einsum("bqhd,bkhd->bhqk", Q, K) / np.sqrt(dim)
    s = jnp.where(jnp.tril(jnp.ones((S, S), bool))[None, None], s, -1e30)
    expected = jnp.einsum("bhqk,bkhd->bqhd", jax.nn.softmax(s, -1), V)
    fn = make_flash_attention(batch=B, heads=H, seq_len=S, dim=dim,
                              causal=True, block_q=128, block_kv=128,
                              out_dtype=jnp.float32, interpret=True)
    out = fn(Q, K, V)
    assert out.shape == (B, S, H, dim)
    assert_close(out, expected, rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("causal", [False, True])
def test_ragged_seq_len(causal):
    """seq_len not divisible by the block: padded tail KV positions must be
    masked (scores -inf, V rows zeroed), not summed into the softmax."""
    from bitblas_tpu.kernels.flash import make_flash_attention
    import numpy as _np
    B, H, S, D = 1, 2, 160, 64
    rng = _np.random.default_rng(0)
    Q = jnp.asarray(rng.standard_normal((B, S, H, D)).astype(_np.float16))
    K = jnp.asarray(rng.standard_normal((B, S, H, D)).astype(_np.float16))
    V = jnp.asarray(rng.standard_normal((B, S, H, D)).astype(_np.float16))
    fn = make_flash_attention(batch=B, heads=H, seq_len=S, dim=D,
                              causal=causal, block_q=128, block_kv=128,
                              interpret=True)
    got = fn(Q, K, V)
    # oracle
    import math
    q, k, v = (t.astype(jnp.float32) for t in (Q, K, V))
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(D)
    if causal:
        qi = jnp.arange(S)[:, None]
        kj = jnp.arange(S)[None, :]
        s = jnp.where(qi >= kj, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    ref = jnp.einsum("bhqk,bkhd->bqhd", p, v)
    assert bool(jnp.all(jnp.isfinite(got.astype(jnp.float32))))
    assert_close(got, ref.astype(got.dtype), rtol=2e-2, atol=2e-2)


def test_flash_decode_length_masked():
    """Decode kernel vs per-sequence masked oracle at ragged lengths."""
    import jax
    from bitblas_tpu.kernels.flash import make_flash_decode

    B, H, Hkv, D, Smax = 3, 8, 4, 128, 512
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, D)).astype(np.float16))
    k = jnp.asarray(rng.standard_normal((B, Smax, Hkv, D)).astype(np.float16))
    v = jnp.asarray(rng.standard_normal((B, Smax, Hkv, D)).astype(np.float16))
    lengths = np.array([17, 512, 300], np.int32)

    fn = make_flash_decode(batch=B, heads=H, max_seq_len=Smax, dim=D,
                           kv_heads=Hkv, block_kv=128, interpret=True)
    out = np.asarray(jax.jit(fn)(q, k, v, jnp.asarray(lengths)), np.float32)

    group = H // Hkv
    kf = np.repeat(np.asarray(k, np.float32), group, axis=2)
    vf = np.repeat(np.asarray(v, np.float32), group, axis=2)
    qf = np.asarray(q, np.float32)
    exp = np.zeros((B, H, D), np.float32)
    for b in range(B):
        L = lengths[b]
        s = np.einsum("hd,khd->hk", qf[b], kf[b, :L]) / np.sqrt(D)
        p = np.exp(s - s.max(axis=1, keepdims=True))
        p /= p.sum(axis=1, keepdims=True)
        exp[b] = np.einsum("hk,khd->hd", p, vf[b, :L])
    assert_close(out, exp, rtol=2e-2, atol=2e-2)


def test_flash_decode_slot_mapped():
    """Flash decode attending straight out of a slot cache (slots out of
    order, more rows than sequences) matches the XLA slot-gather oracle."""
    import jax
    from bitblas_tpu.serving.kv_cache import decode_attention

    B, H, Hkv, D, Smax, ROWS = 3, 4, 2, 128, 256, 6
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((B, H, D)).astype(np.float16))
    ck = jnp.asarray(rng.standard_normal((ROWS, Smax, Hkv, D))
                     .astype(np.float16))
    cv = jnp.asarray(rng.standard_normal((ROWS, Smax, Hkv, D))
                     .astype(np.float16))
    slots = jnp.asarray(np.array([4, 0, 2], np.int32))
    lengths = jnp.asarray(np.array([9, 256, 100], np.int32))

    out_flash = decode_attention(q, ck, cv, slots, lengths, num_heads=H,
                                 use_flash=True)
    out_ref = decode_attention(q, ck, cv, slots, lengths, num_heads=H,
                               use_flash=False)
    assert_close(np.asarray(out_flash, np.float32),
                 np.asarray(out_ref, np.float32), rtol=2e-2, atol=2e-2)


def test_flash_decode_paged_matches_xla():
    """Paged flash decode (scalar-prefetched table walk) vs the XLA
    gather oracle: out-of-order block tables, lengths mid-page, GQA
    group riding one grid step, float + int8-scale variants."""
    from bitblas_tpu.serving.kv_cache import (decode_attention_paged,
                                              decode_attention_paged_quant,
                                              quantize_kv)

    B, H, Hkv, D = 3, 8, 2, 128
    blocks, bs, MB = 12, 16, 4
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.standard_normal((B, H, D)).astype(np.float16))
    ck = jnp.asarray(rng.standard_normal((blocks, bs, Hkv, D))
                     .astype(np.float16))
    cv = jnp.asarray(rng.standard_normal((blocks, bs, Hkv, D))
                     .astype(np.float16))
    tables = jnp.asarray(
        rng.permutation(blocks)[:B * MB].reshape(B, MB), jnp.int32)
    lengths = jnp.asarray([5, 64, 37], jnp.int32)   # mid-page, full, 3rd pg

    out_f = decode_attention_paged(q, ck, cv, tables, lengths,
                                   num_heads=H, use_flash=True)
    out_x = decode_attention_paged(q, ck, cv, tables, lengths,
                                   num_heads=H, use_flash=False)
    assert_close(np.asarray(out_f, np.float32),
                 np.asarray(out_x, np.float32), rtol=2e-2, atol=2e-2)

    # quant flash requires 128-multiple pages (scale rows ride the DMA
    # lane axis) — rebuild the pool at bs=128
    bs2, MB2 = 128, 2
    blocks2 = 6
    ck2 = jnp.asarray(rng.standard_normal((blocks2, bs2, Hkv, D))
                      .astype(np.float16))
    cv2 = jnp.asarray(rng.standard_normal((blocks2, bs2, Hkv, D))
                      .astype(np.float16))
    tables2 = jnp.asarray(
        rng.permutation(blocks2)[:B * MB2].reshape(B, MB2), jnp.int32)
    lengths2 = jnp.asarray([5, 256, 130], jnp.int32)
    kq, ks = quantize_kv(ck2)
    vq, vs = quantize_kv(cv2)
    out_fq = decode_attention_paged_quant(q, kq, vq, ks, vs, tables2,
                                          lengths2, num_heads=H,
                                          use_flash=True)
    out_xq = decode_attention_paged_quant(q, kq, vq, ks, vs, tables2,
                                          lengths2, num_heads=H,
                                          use_flash=False)
    assert_close(np.asarray(out_fq, np.float32),
                 np.asarray(out_xq, np.float32), rtol=2e-2, atol=2e-2)


def test_flash_decode_partial_stats_merge():
    """partial_stats flash decode over two sequence shards (the
    context-parallel layout): per-shard stats from the flash kernel and
    the XLA path agree, and the cross-shard log-sum-exp merge reproduces
    the full-cache decode_attention. Amplified K keeps the softmax peaked
    so shard/merge mistakes cannot hide in near-uniform attention."""
    from bitblas_tpu.serving.kv_cache import (decode_attention,
                                              decode_attention_partial)

    B, H, Hkv, D, S = 3, 4, 2, 128, 64
    SL = S // 2
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.standard_normal((B, H, D)).astype(np.float16))
    ck = jnp.asarray((4 * rng.standard_normal((B, S, Hkv, D)))
                     .astype(np.float16))
    cv = jnp.asarray(rng.standard_normal((B, S, Hkv, D))
                     .astype(np.float16))
    slots = jnp.arange(B, dtype=jnp.int32)
    lengths = jnp.asarray(np.array([5, 33, 64], np.int32))  # straddle SL

    full = np.asarray(decode_attention(q, ck, cv, slots, lengths,
                                       num_heads=H, use_flash=False),
                      np.float32)
    def merged(use_flash):
        stats = []
        for c in (0, 1):
            lloc = jnp.clip(lengths - c * SL, 0, SL)
            stats.append(tuple(np.asarray(t, np.float32)
                               for t in decode_attention_partial(
                q, ck[:, c * SL:(c + 1) * SL], cv[:, c * SL:(c + 1) * SL],
                slots, lloc, num_heads=H, use_flash=use_flash)))
        (a0, m0, l0), (a1, m1, l1) = stats
        # all-masked shards may report l as 0 (flash) or L_loc (XLA) —
        # either is fine because its weight underflows to zero here
        mg = np.maximum(m0, m1)
        w0, w1 = np.exp(m0 - mg), np.exp(m1 - mg)
        lg = l0 * w0 + l1 * w1
        acc = a0 * w0[..., None] + a1 * w1[..., None]
        return acc / np.maximum(lg, 1e-30)[..., None]

    assert_close(merged(use_flash=False), full, rtol=3e-2, atol=3e-2)
    assert_close(merged(use_flash=True), full, rtol=3e-2, atol=3e-2)

    # int8-KV twin: quant shard stats (flash + XLA) merge to the quant
    # full-cache oracle
    from bitblas_tpu.serving.kv_cache import (decode_attention_quant,
                                              decode_attention_quant_partial,
                                              quantize_kv)
    kq, ksc = quantize_kv(ck)
    vq, vsc = quantize_kv(cv)
    full_q = np.asarray(decode_attention_quant(
        q, kq, vq, ksc, vsc, slots, lengths, num_heads=H,
        use_flash=False), np.float32)

    def merged_q(use_flash):
        stats = []
        for c in (0, 1):
            lloc = jnp.clip(lengths - c * SL, 0, SL)
            stats.append(tuple(np.asarray(t, np.float32)
                               for t in decode_attention_quant_partial(
                q, kq[:, c * SL:(c + 1) * SL], vq[:, c * SL:(c + 1) * SL],
                ksc[:, c * SL:(c + 1) * SL], vsc[:, c * SL:(c + 1) * SL],
                slots, lloc, num_heads=H, use_flash=use_flash)))
        (a0, m0, l0), (a1, m1, l1) = stats
        mg = np.maximum(m0, m1)
        w0, w1 = np.exp(m0 - mg), np.exp(m1 - mg)
        lg = l0 * w0 + l1 * w1
        acc = a0 * w0[..., None] + a1 * w1[..., None]
        return acc / np.maximum(lg, 1e-30)[..., None]

    assert_close(merged_q(use_flash=False), full_q, rtol=3e-2, atol=3e-2)
    assert_close(merged_q(use_flash=True), full_q, rtol=3e-2, atol=3e-2)


def test_ntn_untileable_seq_falls_back_to_xla():
    """ntn with seq_len % 128 != 0 cannot tile on TPU (head-interleaved
    K^T lane layout); the op must serve through the XLA oracle instead of
    crashing at build time."""
    cfg = FlashAttenConfig(batch=1, heads=2, seq_len=300, dim=128,
                           layout="ntn")
    run_case(cfg)
