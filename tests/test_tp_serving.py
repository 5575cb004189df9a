"""TP serving: head-local decode + sharded KV cache vs the single-device
model, and the continuous-batching engine running over a mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from bitblas_tpu.models.quant_llama import LlamaConfig, QuantLlama
from bitblas_tpu.testing import assert_close
from bitblas_tpu.parallel.serving import TPQuantLlama
from bitblas_tpu.serving.engine import ContinuousBatchingEngine, Request

CFG = LlamaConfig(hidden_size=256, intermediate_size=512, num_heads=8,
                  num_kv_heads=4, num_layers=2, group_size=64)


def _mesh(tp):
    devs = jax.devices()
    if len(devs) < tp:
        pytest.skip(f"needs {tp} devices")
    return Mesh(np.array(devs[:tp]).reshape(tp), ("tp",))


@pytest.mark.parametrize("tp", [2, 4])
def test_tp_decode_matches_single_device(tp):
    mesh = _mesh(tp)
    src = QuantLlama(CFG, opt_m=(4,))
    tpm = TPQuantLlama(src, mesh)

    B, S = 4, 16
    rng = np.random.default_rng(0)
    ck = jnp.asarray(rng.standard_normal(
        (CFG.num_layers, B, S, CFG.num_kv_heads, CFG.head_dim))
        .astype(np.float32), jnp.bfloat16)
    cv = jnp.asarray(rng.standard_normal(
        (CFG.num_layers, B, S, CFG.num_kv_heads, CFG.head_dim))
        .astype(np.float32), jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((B, 1, CFG.hidden_size))
                    .astype(np.float16))
    slots = jnp.arange(B, dtype=jnp.int32)
    lengths = jnp.asarray([3, 5, 0, 7], jnp.int32)

    y_ref, ck_ref, cv_ref = src.decode_step(x, ck, cv, slots, lengths)
    ck_tp = jax.device_put(ck, tpm.kv_cache_sharding())
    cv_tp = jax.device_put(cv, tpm.kv_cache_sharding())
    y_tp, ck_out, cv_out = tpm.decode_step(x, ck_tp, cv_tp, slots, lengths)

    np.testing.assert_allclose(np.asarray(y_tp, np.float32),
                               np.asarray(y_ref, np.float32),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(ck_out, np.float32),
                               np.asarray(ck_ref, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_tp_kv_head_replication():
    """tp=8 > num_kv_heads=4: each kv head replicates 2x; decode matches
    the single-device model (the Llama-3-70B GQA serving layout)."""
    mesh = _mesh(8)
    import dataclasses
    cfg8 = dataclasses.replace(CFG, group_size=32)  # K/tp must stay group-aligned
    src = QuantLlama(cfg8, opt_m=(4,))  # 8 q heads, 4 kv heads
    tpm = TPQuantLlama(src, mesh)
    assert tpm.kv_rep == 2 and tpm.cfg.num_kv_heads == 8

    B, S = 4, 16
    rng = np.random.default_rng(3)
    ck = jnp.asarray(rng.standard_normal(
        (CFG.num_layers, B, S, CFG.num_kv_heads, CFG.head_dim))
        .astype(np.float32), jnp.bfloat16)
    cv = jnp.asarray(rng.standard_normal(
        (CFG.num_layers, B, S, CFG.num_kv_heads, CFG.head_dim))
        .astype(np.float32), jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((B, 1, CFG.hidden_size))
                    .astype(np.float16))
    slots = jnp.arange(B, dtype=jnp.int32)
    lengths = jnp.asarray([3, 5, 0, 7], jnp.int32)

    y_ref, ck_ref, _ = src.decode_step(x, ck, cv, slots, lengths)

    rep = tpm.kv_rep
    ck_eff = jnp.repeat(ck, rep, axis=3)
    cv_eff = jnp.repeat(cv, rep, axis=3)
    ck_tp = jax.device_put(ck_eff, tpm.kv_cache_sharding())
    cv_tp = jax.device_put(cv_eff, tpm.kv_cache_sharding())
    y_tp, ck_out, _ = tpm.decode_step(x, ck_tp, cv_tp, slots, lengths)

    np.testing.assert_allclose(np.asarray(y_tp, np.float32),
                               np.asarray(y_ref, np.float32),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(
        np.asarray(ck_out, np.float32),
        np.asarray(jnp.repeat(ck_ref, rep, axis=3), np.float32),
        rtol=2e-2, atol=2e-2)


def test_tp_serving_hint_table_loads_and_kernels_build():
    """The committed tp_serving_hints.json (measured 70B TP-local winners,
    survives operator-DB wipes) loads, covers the tp={4,8,16} x
    m={16,64,256} grid for the four fused projections, and every hint
    builds a kernel for its exact local shape."""
    from bitblas_tpu.tuner.curated import tp_serving_hint
    from bitblas_tpu.kernels.dequant_matmul import make_dequant_matmul
    from bitblas_tpu.kernels.spec import KernelSpec
    from bitblas_tpu.ops.matmul_config import MatmulConfig

    HID, KVH, D, INTER = 8192, 8, 128, 28672
    missing = set()
    for tp in (4, 8, 16):
        # REPLICATED kv head count (TPQuantLlama kv_eff): at tp > kv_heads
        # the fused qkv local N is (8192 + 2*16*128)/16 = 768, not 640 —
        # deriving the grid with the unreplicated formula once hid three
        # dead table keys the serving lookup could never hit.
        kv = max(KVH, tp) * D
        for (k, n) in ((HID, (HID + 2 * kv) // tp), (HID // tp, HID),
                       (HID, 2 * INTER // tp), (INTER // tp, HID)):
            for m in (16, 64, 256):
                h = tp_serving_hint(n, k, m)
                if h is None:
                    missing.add((n, k, m))
                    continue
                cfg = MatmulConfig(
                    M=m, N=n, K=k, A_dtype="float16", W_dtype="uint4",
                    with_scaling=True, with_zeros=True,
                    zeros_mode="original", group_size=128,
                    out_dtype="float16")
                spec = KernelSpec.from_config(cfg, m)
                make_dequant_matmul(spec, h, interpret=True)  # must build
    # Every grid cell must resolve, except cells known untuned (tp=8 m=16
    # never ran on chip — queued; tighten to empty once it lands).
    known_untuned = {(1280, 8192, 16), (8192, 1024, 16),
                     (7168, 8192, 16), (8192, 3584, 16)}
    assert missing <= known_untuned, sorted(missing - known_untuned)


def test_tp_context_parallel_decode_matches_single_device():
    """tp=8 > num_kv_heads=4 with context_parallel: the cache shards its
    SEQUENCE axis across each kv-head pair instead of replicating heads —
    per-chip KV reads and cache footprint halve; partial softmaxes merge
    over the cp subgroup. Decode must match the single-device model and
    the cache stays in SOURCE-head layout (no repeat)."""
    mesh = _mesh(8)
    import dataclasses
    cfg8 = dataclasses.replace(CFG, group_size=32)
    src = QuantLlama(cfg8, opt_m=(4,))
    tpm = TPQuantLlama(src, mesh, context_parallel=True)
    assert tpm.context_parallel and tpm.cp == 2
    assert tpm.cfg.num_kv_heads == 4          # source heads, unreplicated

    B, S = 4, 16
    rng = np.random.default_rng(5)
    # Amplified K: random-init quantized weights yield near-zero logits and
    # a near-uniform softmax, where every head's attention collapses to
    # ~mean(V) and a head-mixing merge bug stays inside tolerance. Peaked
    # softmax (20x K) made the original elementwise-merge-over-disjoint-
    # head-sets bug fail at 0.145 abs while correct paths stay ~1e-3.
    ck = jnp.asarray(20.0 * rng.standard_normal(
        (CFG.num_layers, B, S, CFG.num_kv_heads, CFG.head_dim))
        .astype(np.float32), jnp.bfloat16)
    cv = jnp.asarray(rng.standard_normal(
        (CFG.num_layers, B, S, CFG.num_kv_heads, CFG.head_dim))
        .astype(np.float32), jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((B, 1, CFG.hidden_size))
                    .astype(np.float16))
    slots = jnp.arange(B, dtype=jnp.int32)
    # lengths straddle the cp boundary (S_loc = 8): 3 and 5 live entirely
    # in shard 0, 9 and 12 span both shards; appends land at 3/5 (shard 0)
    # and 9/12 (shard 1).
    lengths = jnp.asarray([3, 5, 9, 12], jnp.int32)

    y_ref, ck_ref, cv_ref = src.decode_step(x, ck, cv, slots, lengths)
    ck_tp = jax.device_put(ck, tpm.kv_cache_sharding())
    cv_tp = jax.device_put(cv, tpm.kv_cache_sharding())
    y_tp, ck_out, cv_out = tpm.decode_step(x, ck_tp, cv_tp, slots, lengths)

    np.testing.assert_allclose(np.asarray(y_tp, np.float32),
                               np.asarray(y_ref, np.float32),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(ck_out, np.float32),
                               np.asarray(ck_ref, np.float32),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(cv_out, np.float32),
                               np.asarray(cv_ref, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_tp_context_parallel_chunk_matches_single_device():
    """cp decode_chunk: a T-token append straddling the shard boundary and
    per-query causal limits must match the single-device chunk decode
    (peaked K so head/shard mixing cannot hide)."""
    mesh = _mesh(8)
    import dataclasses
    cfg8 = dataclasses.replace(CFG, group_size=32)
    src = QuantLlama(cfg8, opt_m=(4,))
    tpm = TPQuantLlama(src, mesh, context_parallel=True)

    B, S, T = 4, 16, 3
    rng = np.random.default_rng(12)
    ck = jnp.asarray(20.0 * rng.standard_normal(
        (CFG.num_layers, B, S, CFG.num_kv_heads, CFG.head_dim))
        .astype(np.float32), jnp.bfloat16)
    cv = jnp.asarray(rng.standard_normal(
        (CFG.num_layers, B, S, CFG.num_kv_heads, CFG.head_dim))
        .astype(np.float32), jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((B, T, CFG.hidden_size))
                    .astype(np.float16))
    slots = jnp.arange(B, dtype=jnp.int32)
    # starts 6 and 7: the 3-token chunk straddles the S_loc=8 boundary
    lengths = jnp.asarray([2, 6, 7, 12], jnp.int32)

    y_ref, ck_ref, cv_ref = src.decode_chunk(x, ck, cv, slots, lengths)
    ck_tp = jax.device_put(ck, tpm.kv_cache_sharding())
    cv_tp = jax.device_put(cv, tpm.kv_cache_sharding())
    y_tp, ck_out, cv_out = tpm.decode_chunk(x, ck_tp, cv_tp, slots, lengths)

    np.testing.assert_allclose(np.asarray(y_tp, np.float32),
                               np.asarray(y_ref, np.float32),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(ck_out, np.float32),
                               np.asarray(ck_ref, np.float32),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(cv_out, np.float32),
                               np.asarray(cv_ref, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_tp_context_parallel_quant_kv_decode():
    """cp + int8 KV: sequence-sharded codes AND scale planes; decode
    tracks the cp float-cache decode within int8 tolerance."""
    from bitblas_tpu.serving.kv_cache import quantize_kv
    mesh = _mesh(8)
    import dataclasses
    cfg8 = dataclasses.replace(CFG, group_size=32)
    src = QuantLlama(cfg8, opt_m=(4,))
    tpm = TPQuantLlama(src, mesh, context_parallel=True)

    B, S = 4, 16
    Hkv, D, Ly = CFG.num_kv_heads, CFG.head_dim, CFG.num_layers
    rng = np.random.default_rng(15)
    ck = jnp.asarray(4.0 * rng.standard_normal((Ly, B, S, Hkv, D))
                     .astype(np.float32), jnp.bfloat16)
    cv = jnp.asarray(rng.standard_normal((Ly, B, S, Hkv, D))
                     .astype(np.float32), jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((B, 1, CFG.hidden_size))
                    .astype(np.float16))
    slots = jnp.arange(B, dtype=jnp.int32)
    lengths = jnp.asarray([3, 5, 9, 12], jnp.int32)

    y_f, *_ = tpm.decode_step(
        jax.device_put(x, None),
        jax.device_put(ck, tpm.kv_cache_sharding()),
        jax.device_put(cv, tpm.kv_cache_sharding()), slots, lengths)

    kq, ks = quantize_kv(ck)
    vq, vs = quantize_kv(cv)
    kvsh = tpm.kv_cache_sharding()
    from jax.sharding import NamedSharding
    ssh = NamedSharding(tpm.smesh, tpm._ks_spec)
    y_q, *_ = tpm.decode_step_quant(
        x, jax.device_put(kq, kvsh), jax.device_put(vq, kvsh),
        jax.device_put(ks, ssh), jax.device_put(vs, ssh), slots, lengths)

    a = np.asarray(y_f, np.float32)
    b = np.asarray(y_q, np.float32)
    rel = np.abs(a - b).max() / max(1e-6, np.abs(a).max())
    assert rel < 0.06, rel

    # chunked twin: T tokens straddling the shard boundary over the same
    # int8 cp cache tracks the float cp chunk decode
    T = 3
    xc = jnp.asarray(rng.standard_normal((B, T, CFG.hidden_size))
                     .astype(np.float16))
    lengths_c = jnp.asarray([2, 6, 7, 12], jnp.int32)
    y_cf, *_ = tpm.decode_chunk(
        xc, jax.device_put(ck, kvsh), jax.device_put(cv, kvsh),
        slots, lengths_c)
    y_cq, *_ = tpm.decode_chunk_quant(
        xc, jax.device_put(kq, kvsh), jax.device_put(vq, kvsh),
        jax.device_put(ks, ssh), jax.device_put(vs, ssh), slots, lengths_c)
    a = np.asarray(y_cf, np.float32)
    b = np.asarray(y_cq, np.float32)
    rel = np.abs(a - b).max() / max(1e-6, np.abs(a).max())
    assert rel < 0.06, rel


def test_tp_context_parallel_prefill_matches_single_device():
    """cp prefill returns SOURCE-head K/V (de-replicated from the eff-head
    gather) and the same hidden states."""
    mesh = _mesh(8)
    import dataclasses
    cfg8 = dataclasses.replace(CFG, group_size=32)
    src = QuantLlama(cfg8, opt_m=(4,))
    tpm = TPQuantLlama(src, mesh, context_parallel=True)
    rng = np.random.default_rng(6)
    S = 8
    x = jnp.asarray(rng.standard_normal((1, S, CFG.hidden_size))
                    .astype(np.float16))
    pos = jnp.arange(S)[None, :]
    h_ref, ks_ref, vs_ref = src.make_prefill(S)(x, pos)
    h_tp, ks_tp, vs_tp = tpm.make_prefill(S)(x, pos)
    np.testing.assert_allclose(np.asarray(h_tp, np.float32),
                               np.asarray(h_ref, np.float32),
                               rtol=2e-2, atol=2e-2)
    for a, b in zip(ks_tp + vs_tp, ks_ref + vs_ref):
        assert a.shape == b.shape            # source-head count
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=2e-2, atol=2e-2)


def test_tp_prefill_matches_single_device():
    mesh = _mesh(4)
    src = QuantLlama(CFG, opt_m=(4,))
    tpm = TPQuantLlama(src, mesh)
    rng = np.random.default_rng(1)
    S = 8
    x = jnp.asarray(rng.standard_normal((1, S, CFG.hidden_size))
                    .astype(np.float16))
    pos = jnp.arange(S)[None, :]
    h_ref, ks_ref, vs_ref = src.make_prefill(S)(x, pos)
    h_tp, ks_tp, vs_tp = tpm.make_prefill(S)(x, pos)
    np.testing.assert_allclose(np.asarray(h_tp, np.float32),
                               np.asarray(h_ref, np.float32),
                               rtol=2e-2, atol=2e-2)
    for a, b in zip(ks_tp, ks_ref):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=2e-2, atol=2e-2)


def test_paged_engine_over_mesh_matches_single_device():
    from bitblas_tpu.serving.engine import PagedContinuousBatchingEngine
    mesh = _mesh(4)
    src = QuantLlama(CFG, opt_m=(4,))
    tpm = TPQuantLlama(src, mesh)
    rng = np.random.default_rng(5)
    prompts = [rng.standard_normal((s, CFG.hidden_size)).astype(np.float16)
               for s in (3, 6)]

    def run(model, cache_sharding=None):
        eng = PagedContinuousBatchingEngine(
            model, num_slots=4, num_blocks=32, block_size=4,
            cache_sharding=cache_sharding)
        for i, p in enumerate(prompts):
            eng.submit(Request(uid=i, prompt=p.copy(), max_new=3))
        done = eng.run_to_completion()
        assert len(done) == len(prompts)
        return {r.uid: r.final_hidden for r in done}

    f_ref = run(src)
    f_tp = run(tpm, cache_sharding=tpm.kv_cache_sharding())
    for uid in f_ref:
        assert_close(f_tp[uid], f_ref[uid], rtol=5e-2, atol=5e-2,
                     max_mismatched_ratio=0.02)


def test_engine_over_mesh_matches_single_device():
    mesh = _mesh(4)
    src = QuantLlama(CFG, opt_m=(4,))
    tpm = TPQuantLlama(src, mesh)
    rng = np.random.default_rng(2)
    prompts = [rng.standard_normal((s, CFG.hidden_size)).astype(np.float16)
               for s in (3, 5)]

    def run(model, cache_sharding=None):
        eng = ContinuousBatchingEngine(model, num_slots=4, max_seq_len=32,
                                       cache_sharding=cache_sharding)
        for i, p in enumerate(prompts):
            eng.submit(Request(uid=i, prompt=p, max_new=3))
        done = eng.run_to_completion()
        assert len(done) == len(prompts)
        return np.asarray(eng.last_hidden, np.float32)

    h_ref = run(src)
    h_tp = run(tpm, cache_sharding=tpm.kv_cache_sharding())
    assert_close(h_tp, h_ref, rtol=5e-2, atol=5e-2,
                 max_mismatched_ratio=0.02)


def test_engine_over_cp_mesh_matches_single_device():
    """Continuous batching end-to-end with the context-parallel cache
    (tp=8 > kv_heads=4): admission prefill writes the sequence-sharded
    source-head cache, decode merges partial softmaxes across cp."""
    mesh = _mesh(8)
    import dataclasses
    cfg8 = dataclasses.replace(CFG, group_size=32)
    src = QuantLlama(cfg8, opt_m=(4,))
    tpm = TPQuantLlama(src, mesh, context_parallel=True)
    rng = np.random.default_rng(9)
    prompts = [rng.standard_normal((s, CFG.hidden_size)).astype(np.float16)
               for s in (3, 5)]

    def run(model, cache_sharding=None):
        eng = ContinuousBatchingEngine(model, num_slots=4, max_seq_len=32,
                                       cache_sharding=cache_sharding)
        for i, p in enumerate(prompts):
            eng.submit(Request(uid=i, prompt=p, max_new=3))
        done = eng.run_to_completion()
        assert len(done) == len(prompts)
        return np.asarray(eng.last_hidden, np.float32)

    h_ref = run(src)
    h_tp = run(tpm, cache_sharding=tpm.kv_cache_sharding())
    assert_close(h_tp, h_ref, rtol=5e-2, atol=5e-2,
                 max_mismatched_ratio=0.02)


def test_quantized_collectives_close_to_exact():
    """int8-quantized all-reduce (all-gather + local sum) tracks the exact
    psum decode within quantization error."""
    mesh = _mesh(4)
    src = QuantLlama(CFG, opt_m=(4,))
    exact = TPQuantLlama(src, mesh)
    quant = TPQuantLlama(src, mesh, quantized_collectives=True)

    B, S = 4, 16
    rng = np.random.default_rng(7)
    ck = jnp.asarray(rng.standard_normal(
        (CFG.num_layers, B, S, CFG.num_kv_heads, CFG.head_dim))
        .astype(np.float32), jnp.bfloat16)
    cv = jnp.zeros_like(ck)
    x = jnp.asarray(rng.standard_normal((B, 1, CFG.hidden_size))
                    .astype(np.float16))
    slots = jnp.arange(B, dtype=jnp.int32)
    lengths = jnp.asarray([3, 5, 0, 7], jnp.int32)
    cks = jax.device_put(ck, exact.kv_cache_sharding())
    cvs = jax.device_put(cv, exact.kv_cache_sharding())
    y_e, _, _ = exact.decode_step(x, cks, cvs, slots, lengths)
    y_q, _, _ = quant.decode_step(x, cks, cvs, slots, lengths)
    a = np.asarray(y_e, np.float32)
    b = np.asarray(y_q, np.float32)
    rel = np.abs(a - b).max() / max(1e-6, np.abs(a).max())
    assert rel < 0.05, rel


def test_overlap_chunks_decode_matches_single_device():
    """Chunked row-parallel reduces (comm/compute overlap) keep decode
    numerics — chunk width must cover whole uint4 pack tiles (256 cols)."""
    cfg = LlamaConfig(hidden_size=512, intermediate_size=1024, num_heads=8,
                      num_kv_heads=4, num_layers=1, group_size=64)
    mesh = _mesh(2)
    src = QuantLlama(cfg, opt_m=(4,))
    tpm = TPQuantLlama(src, mesh, overlap_chunks=2)

    B, S = 4, 8
    rng = np.random.default_rng(1)
    ck = jnp.asarray(rng.standard_normal(
        (cfg.num_layers, B, S, cfg.num_kv_heads, cfg.head_dim))
        .astype(np.float32), jnp.bfloat16)
    cv = jnp.zeros_like(ck)
    x = jnp.asarray(rng.standard_normal((B, 1, cfg.hidden_size))
                    .astype(np.float16))
    slots = jnp.arange(B, dtype=jnp.int32)
    lengths = jnp.asarray([3, 5, 0, 7], jnp.int32)

    y_ref, _, _ = src.decode_step(x, ck, cv, slots, lengths)
    ck_tp = jax.device_put(ck, tpm.kv_cache_sharding())
    cv_tp = jax.device_put(cv, tpm.kv_cache_sharding())
    y_tp, _, _ = tpm.decode_step(x, ck_tp, cv_tp, slots, lengths)
    np.testing.assert_allclose(np.asarray(y_tp, np.float32),
                               np.asarray(y_ref, np.float32),
                               rtol=2e-2, atol=2e-2)

    # prefill path through the same chunked projections
    xs = jnp.asarray(rng.standard_normal((1, S, cfg.hidden_size))
                     .astype(np.float16))
    pos = jnp.broadcast_to(jnp.arange(S)[None, :], (1, S))
    pre_ref = src.make_prefill(S)(xs, pos)
    pre_tp = tpm.make_prefill(S)(xs, pos)
    np.testing.assert_allclose(np.asarray(pre_tp[0], np.float32),
                               np.asarray(pre_ref[0], np.float32),
                               rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("tp", [2])
def test_tp_quant_kv_decode_matches_float(tp):
    """TP decode over the int8-quantized KV cache tracks the float-cache TP
    decode within int8-quantization tolerance; caches/scales stay sharded."""
    from bitblas_tpu.serving.kv_cache import quantize_kv

    mesh = _mesh(tp)
    src = QuantLlama(CFG, opt_m=(4,))
    tpm = TPQuantLlama(src, mesh)

    B, S, Lmax = 4, 8, 16
    Hkv, D, Ly = CFG.num_kv_heads, CFG.head_dim, CFG.num_layers
    rng = np.random.default_rng(5)
    hist_k = rng.standard_normal((Ly, B, S, Hkv, D)).astype(np.float32)
    hist_v = rng.standard_normal((Ly, B, S, Hkv, D)).astype(np.float32)
    ck = jnp.zeros((Ly, B, Lmax, Hkv, D), jnp.float32).at[:, :, :S].set(hist_k)
    cv = jnp.zeros((Ly, B, Lmax, Hkv, D), jnp.float32).at[:, :, :S].set(hist_v)
    x = jnp.asarray(rng.standard_normal((B, 1, CFG.hidden_size))
                    .astype(np.float16))
    slots = jnp.arange(B, dtype=jnp.int32)
    lengths = jnp.full((B,), S, jnp.int32)

    ck_tp = jax.device_put(ck, tpm.kv_cache_sharding())
    cv_tp = jax.device_put(cv, tpm.kv_cache_sharding())
    y_ref, _, _ = tpm.decode_step(x, ck_tp, cv_tp, slots, lengths)

    kq, ks = quantize_kv(jnp.asarray(hist_k))
    vq, vs = quantize_kv(jnp.asarray(hist_v))
    cq_k = jnp.zeros((Ly, B, Lmax, Hkv, D), jnp.int8).at[:, :, :S].set(kq)
    cq_v = jnp.zeros((Ly, B, Lmax, Hkv, D), jnp.int8).at[:, :, :S].set(vq)
    sq_k = jnp.zeros((Ly, B, Lmax, Hkv), jnp.float32).at[:, :, :S].set(ks)
    sq_v = jnp.zeros((Ly, B, Lmax, Hkv), jnp.float32).at[:, :, :S].set(vs)
    from jax.sharding import NamedSharding, PartitionSpec as P
    scale_sh = NamedSharding(mesh, P(None, None, None, "tp"))
    y_q, cq_k, cq_v, sq_k, sq_v = tpm.decode_step_quant(
        x, jax.device_put(cq_k, tpm.kv_cache_sharding()),
        jax.device_put(cq_v, tpm.kv_cache_sharding()),
        jax.device_put(sq_k, scale_sh), jax.device_put(sq_v, scale_sh),
        slots, lengths)
    assert cq_k.dtype == jnp.int8
    np.testing.assert_allclose(np.asarray(y_q, np.float32),
                               np.asarray(y_ref, np.float32),
                               rtol=5e-2, atol=0.3)


def test_tp_paged_kv_quant_engine():
    """Paged engine with kv_quant=True over a TP mesh (sharded int8 block
    pool + scale planes) completes requests with finite outputs and tracks
    the float paged TP engine."""
    from bitblas_tpu.serving.engine import PagedContinuousBatchingEngine

    mesh = _mesh(2)
    src = QuantLlama(CFG, opt_m=(1, 4, 8, 16))
    tpm = TPQuantLlama(src, mesh)
    outs = {}
    for quant in (False, True):
        eng = PagedContinuousBatchingEngine(
            tpm, num_slots=3, num_blocks=32, block_size=4,
            cache_sharding=tpm.kv_cache_sharding(),  # same 5D spec paged
            kv_quant=quant)
        rng = np.random.default_rng(9)
        for i in range(3):
            eng.submit(Request(
                uid=i,
                prompt=rng.standard_normal(
                    (int(rng.integers(2, 7)), CFG.hidden_size)
                ).astype(np.float16),
                max_new=2))
        fin = eng.run_to_completion(max_steps=60)
        assert len(fin) == 3 and all(r.done for r in fin)
        outs[quant] = {r.uid: r.final_hidden for r in fin}
    for uid in outs[False]:
        assert_close(outs[True][uid], outs[False][uid], rtol=5e-2, atol=0.3)


def test_tp_sliding_window_matches_single_device():
    """Non-cp TP decode under a sliding window tracks the single-chip
    windowed model; cp + window raises loudly."""
    import dataclasses
    mesh = _mesh(4)
    cfg_w = dataclasses.replace(CFG, sliding_window=6)
    src = QuantLlama(cfg_w, opt_m=(4,))
    tpm = TPQuantLlama(src, mesh)

    B, S = 4, 16
    rng = np.random.default_rng(2)
    ck = jnp.asarray(rng.standard_normal(
        (cfg_w.num_layers, B, S, cfg_w.num_kv_heads, cfg_w.head_dim))
        .astype(np.float32), jnp.bfloat16)
    cv = jnp.asarray(rng.standard_normal(
        (cfg_w.num_layers, B, S, cfg_w.num_kv_heads, cfg_w.head_dim))
        .astype(np.float32), jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((B, 1, cfg_w.hidden_size))
                    .astype(np.float16))
    slots = jnp.arange(B, dtype=jnp.int32)
    lengths = jnp.asarray([3, 8, 12, 15], jnp.int32)

    y_ref, _, _ = src.decode_step(x, ck, cv, slots, lengths)
    ck_tp = jax.device_put(ck, tpm.kv_cache_sharding())
    cv_tp = jax.device_put(cv, tpm.kv_cache_sharding())
    y_tp, _, _ = tpm.decode_step(x, ck_tp, cv_tp, slots, lengths)
    np.testing.assert_allclose(np.asarray(y_tp, np.float32),
                               np.asarray(y_ref, np.float32),
                               rtol=2e-2, atol=2e-2)

    # windowed must differ from unwindowed at the same weights (length 15
    # > window 6): proves the window actually reached the TP attention
    src_full = QuantLlama(CFG, opt_m=(4,))
    for name in ("q", "k", "v", "o", "gate", "up", "down"):
        for li in range(CFG.num_layers):
            src_full.layers[li].weights[name] = src.layers[li].weights[name]
    y_full, _, _ = src_full.decode_step(x, ck, cv, slots, lengths)
    assert np.abs(np.asarray(y_full, np.float32)[3]
                  - np.asarray(y_ref, np.float32)[3]).max() > 1e-3

    import pytest as _pytest
    import dataclasses as _dc
    cfg8 = _dc.replace(cfg_w, num_heads=8, num_kv_heads=4, hidden_size=256,
                       intermediate_size=256)
    mesh8 = _mesh(8)
    src8 = QuantLlama(cfg8, opt_m=(4,))
    with _pytest.raises(NotImplementedError, match="sliding_window"):
        TPQuantLlama(src8, mesh8, context_parallel=True)
