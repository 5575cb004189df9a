"""lift_arrays: closure-constant weights become jit arguments (the axon
remote-compile transport rejects big constant-embedding computations —
CLAUDE.md closure-constant limit)."""

import jax
import jax.numpy as jnp
import numpy as np

from bitblas_tpu.utils.lift import lift_arrays


class _Proj:
    def __init__(self, seed):
        rng = np.random.default_rng(seed)
        # packed-operand tuple with a None (zeros slot unused)
        self.packed = (jnp.asarray(rng.standard_normal((8, 8)),
                                   jnp.float32),
                       jnp.asarray(rng.standard_normal((1, 8)),
                                   jnp.float32),
                       None)


class _Layer:
    def __init__(self, seed):
        self.weights = {"q": _Proj(seed), "k": _Proj(seed + 1)}
        self.norm = jnp.ones((8,), jnp.float32)

    def forward(self, x):
        for p in self.weights.values():
            w, s, _ = p.packed
            x = (x @ w) * s
        return x * self.norm


class _Model:
    def __init__(self):
        self.layers = [_Layer(0), _Layer(10)]

    def forward(self, x):
        for l in self.layers:
            x = l.forward(x)
        return x


def test_lift_roundtrip_and_argification():
    m = _Model()
    x = jnp.asarray(np.random.default_rng(3).standard_normal((2, 8)),
                    jnp.float32)
    want = np.asarray(m.forward(x))

    vals, bind = lift_arrays(m)
    # 2 layers x (2 projections x 2 arrays + 1 norm) = 10 leaves
    assert len(vals) == 10

    calls = []

    def fn(vals, x):
        bind(vals)
        calls.append(1)
        return m.forward(x)

    jfn = jax.jit(fn)
    got = np.asarray(jfn(vals, x))
    np.testing.assert_allclose(got, want, rtol=1e-6)

    # restore concrete arrays (trace left tracers in place)
    bind(vals)
    np.testing.assert_allclose(np.asarray(m.forward(x)), want, rtol=1e-6)

    # weights are ARGUMENTS: new values change the output without retrace
    vals2 = [v * 2 for v in vals]
    got2 = np.asarray(jfn(vals2, x))
    assert len(calls) == 1, "changing values must not retrace"
    assert not np.allclose(got2, want), "values must feed the computation"
    bind(vals)


def test_jit_lifted_signature_and_restore():
    from bitblas_tpu.utils.lift import jit_lifted
    m = _Model()
    x = jnp.asarray(np.random.default_rng(4).standard_normal((2, 8)),
                    jnp.float32)
    want = np.asarray(m.forward(x))
    f = jit_lifted(m.forward, m)
    np.testing.assert_allclose(np.asarray(f(x)), want, rtol=1e-6)
    # owner holds concrete arrays again after the call
    assert all(not isinstance(l.norm, jax.core.Tracer) for l in m.layers)
    np.testing.assert_allclose(np.asarray(m.forward(x)), want, rtol=1e-6)


def test_jit_lifted_donate_shift():
    """donate_argnums refer to fn's own signature; the donated buffer
    must actually be consumed (donation error would surface on reuse)."""
    from bitblas_tpu.utils.lift import jit_lifted
    m = _Model()

    def step(cache, x):
        return cache + m.forward(x), x

    f = jit_lifted(step, m, donate_argnums=(0,))
    cache = jnp.zeros((2, 8), jnp.float32)
    x = jnp.asarray(np.random.default_rng(5).standard_normal((2, 8)),
                    jnp.float32)
    out, _ = f(cache, x)
    assert out.shape == (2, 8)


def test_bind_length_check():
    m = _Model()
    vals, bind = lift_arrays(m)
    try:
        bind(vals[:-1])
    except ValueError:
        pass
    else:
        raise AssertionError("short bind must raise")


class _SlotProj:
    __slots__ = ("w", "name")

    def __init__(self, seed):
        rng = np.random.default_rng(seed)
        self.w = jnp.asarray(rng.standard_normal((8, 8)), jnp.float32)
        self.name = f"p{seed}"


class _SlotModel:
    __slots__ = ("proj", "norm")

    def __init__(self):
        self.proj = _SlotProj(7)
        self.norm = jnp.ones((8,), jnp.float32)

    def forward(self, x):
        return (x @ self.proj.w) * self.norm


def test_lift_slots_objects():
    """__slots__ classes have no __dict__; their arrays must still be
    harvested (ADVICE r4) and bind must write back through setattr."""
    m = _SlotModel()
    x = jnp.asarray(np.random.default_rng(8).standard_normal((2, 8)),
                    jnp.float32)
    want = np.asarray(m.forward(x))
    vals, bind = lift_arrays(m)
    assert len(vals) == 2, f"expected proj.w + norm, got {len(vals)}"

    def fn(vals, x):
        bind(vals)
        return m.forward(x)

    got = np.asarray(jax.jit(fn)(vals, x))
    np.testing.assert_allclose(got, want, rtol=1e-6)
    bind(vals)
    assert not isinstance(m.norm, jax.core.Tracer)
    np.testing.assert_allclose(np.asarray(m.forward(x)), want, rtol=1e-6)


def test_jit_lifted_stale_weight_warning():
    """Replacing a weight on the owner after wrapping must warn on the
    next retrace (the wrapper keeps computing with captured arrays)."""
    import logging
    from bitblas_tpu.common import get_logger
    from bitblas_tpu.utils.lift import jit_lifted
    m = _Model()
    f = jit_lifted(m.forward, m)
    records = []

    class _Catch(logging.Handler):
        def emit(self, record):
            records.append(record.getMessage())

    h = _Catch(level=logging.WARNING)
    get_logger().addHandler(h)  # repo logger has propagate=False
    try:
        x2 = jnp.ones((2, 8), jnp.float32)
        f(x2)  # first trace: no warning
        assert not any("jit_lifted" in r for r in records)
        m.layers[0].norm = jnp.zeros((8,), jnp.float32)  # stale hazard
        x3 = jnp.ones((3, 8), jnp.float32)  # new shape -> retrace
        f(x3)
        assert any("jit_lifted" in r for r in records)
    finally:
        get_logger().removeHandler(h)
