"""QuantMixtral: MoE decoder through the shared serving surface.

The MoE FFN rides the `mlp_forward` duck-type hook in
quant_llama._layer_mlp, so prefill/decode/chunk/engines/generate all work;
these tests pin full-forward vs KV-decode parity (routing must behave
identically at T=prompt and T=1) and token-engine serving.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from bitblas_tpu.models import (MixtralConfig, QuantLlamaLM, QuantMixtral)
from bitblas_tpu.models.hf_import import LMHead
from bitblas_tpu.serving import TokenContinuousBatchingEngine

V, H = 64, 256
CFG = MixtralConfig(hidden_size=H, intermediate_size=512, num_heads=4,
                    num_kv_heads=2, num_layers=2, vocab_size=V,
                    group_size=128, n_experts=4, top_k=2,
                    capacity_factor=2.0)


@pytest.fixture(scope="module")
def lm():
    model = QuantMixtral(CFG, opt_m=(1, 4, 8, 16), moe_tokens=16)
    rng = np.random.default_rng(0)
    head = LMHead(
        embed=jnp.asarray(rng.standard_normal((V, H)) * 0.05, jnp.float16),
        final_norm=jnp.ones((H,), jnp.float32),
        lm_head=jnp.asarray(rng.standard_normal((V, H)) * 0.05, jnp.float32),
    )
    return QuantLlamaLM(model, head)


def test_moe_layer_accepts_any_token_count(lm):
    layer = lm.model.layers[0].moe
    rng = np.random.default_rng(1)
    for t in (1, 8, 16, 40):
        y = layer.forward(jnp.asarray(
            rng.standard_normal((t, H)) * 0.1, jnp.float16))
        assert y.shape == (t, H)
        assert np.all(np.isfinite(np.asarray(y, np.float32)))


def test_mixtral_generate_matches_full_forward(lm):
    """KV-cache decode == full-forward recompute: routing decisions and
    attention bookkeeping agree between T=prompt prefill and T=1 decode.

    Capacity note: at T=1 every routed token fits (capacity >= 8), and at
    prompt T the fixture's capacity_factor=2.0 keeps drops rare; greedy
    argmax parity still requires the SAME routing on both paths, which is
    the property under test."""
    prompt = np.arange(6, dtype=np.int32)
    out = lm.generate(prompt, max_new_tokens=4, temperature=0.0)
    assert out.shape == (10,)
    for t in range(6, 10):
        logits = np.asarray(lm(jnp.asarray(out[:t])[None]))[0, -1]
        assert int(np.argmax(logits)) == out[t], t


def test_mixtral_token_engine(lm):
    solo = lm.generate(np.arange(5), max_new_tokens=4, temperature=0.0)
    eng = TokenContinuousBatchingEngine(lm.model, lm.head, num_slots=2,
                                        max_seq_len=32)
    req = eng.submit_tokens(uid=0, tokens=np.arange(5), max_new=4)
    eng.run_to_completion()
    assert req.done
    assert np.array_equal(np.asarray(req.out_tokens), solo[5:])


def test_mixtral_state_dict_roundtrip(lm):
    sd = lm.model.state_dict()
    other = QuantMixtral(CFG, opt_m=(1, 4, 8, 16), moe_tokens=16)
    other.load_state_dict(sd)
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((1, 8, H)) * 0.1, jnp.float16)
    pos = jnp.arange(8)[None]
    np.testing.assert_array_equal(np.asarray(lm.model(x, pos)),
                                  np.asarray(other(x, pos)))


def test_zero_rows_do_not_consume_expert_capacity(lm):
    """Reproduction guard (r2 self-review): a real token batched with
    zero pad rows must get the same MoE output as solo — pad rows are
    masked out of routing instead of claiming capacity slots."""
    layer = lm.model.layers[0].moe
    rng = np.random.default_rng(12)
    real = jnp.asarray(rng.standard_normal((1, H)) * 0.1, jnp.float16)
    solo = np.asarray(layer.forward(real), np.float32)
    padded = jnp.zeros((32, H), jnp.float16).at[31].set(real[0])
    batched = np.asarray(layer.forward(padded), np.float32)
    np.testing.assert_allclose(batched[31], solo[0], rtol=1e-3, atol=1e-5)
    np.testing.assert_array_equal(batched[:31], 0.0)


def test_expert_parallel_mixtral_matches_single_device(lm):
    """expert_parallel_mixtral swaps the routed FFN to EP execution; the
    served token stream matches the single-device model exactly."""
    import jax
    from jax.sharding import Mesh
    from bitblas_tpu.parallel.moe import expert_parallel_mixtral

    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs 2 devices")
    ref = lm.generate(np.arange(5), max_new_tokens=4, temperature=0.0)

    epm = QuantMixtral(CFG, opt_m=(1, 4, 8, 16), moe_tokens=16)
    epm.load_state_dict(lm.model.state_dict())
    mesh = Mesh(np.array(devs[:2]).reshape(2), ("ep",))
    expert_parallel_mixtral(epm, mesh)
    eplm = QuantLlamaLM(epm, lm.head)
    out = eplm.generate(np.arange(5), max_new_tokens=4, temperature=0.0)
    assert np.array_equal(out, ref)


def test_mixtral_checkpoint_module_roundtrip(lm, tmp_path):
    """save_quant_state/load_quant_state handle the Mixtral tree (incl.
    per-expert bundles) like the other families."""
    from bitblas_tpu.module.checkpoint import (load_quant_state,
                                               save_quant_state)
    save_quant_state(str(tmp_path / "mix"), lm.model.state_dict())
    other = QuantMixtral(CFG, opt_m=(1, 4, 8, 16), moe_tokens=16)
    other.load_state_dict(load_quant_state(str(tmp_path / "mix")))
    rng = np.random.default_rng(21)
    x = jnp.asarray(rng.standard_normal((1, 8, H)) * 0.1, jnp.float16)
    pos = jnp.arange(8)[None]
    np.testing.assert_array_equal(np.asarray(lm.model(x, pos)),
                                  np.asarray(other(x, pos)))
