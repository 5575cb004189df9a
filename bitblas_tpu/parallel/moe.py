"""Expert-parallel MoE placement over an "ep" mesh axis.

Experts shard across devices (leading dim of the stacked per-expert
weights); the router and activations are replicated. Each device computes
the full dispatch (the router is a tiny dense matmul), slices out its
local experts' dispatch/combine columns with its axis index, runs the
fused quantized FFN for its local experts, and joins the partial outputs
with ONE psum — the dense-dispatch formulation of GShard-style expert
parallelism (no all_to_all needed while activations are replicated;
compose with dp/tp axes for the sharded-activation variant).

Reference: the reference library has no parallelism layer (SURVEY.md
§2.11); this extends the same fused-kernel surface the way
parallel/layers.py does for TP.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from ..kernels.dequant_matmul import make_dequant_matmul
from ..kernels.spec import KernelSpec
from ..models.quant_moe import (MoEConfig, QuantMoELayer, _EXPERT_PROJS,
                                dispatch_combine)
from ..tuner import default_hint, get_arch


class EPQuantMoELayer:
    """Expert-parallel wrapper; built from a single-device QuantMoELayer so
    tests can assert EP == single-device numerics."""

    def __init__(self, layer: QuantMoELayer, mesh: Mesh, axis: str = "ep",
                 interpret: Optional[bool] = None):
        cfg = layer.cfg
        self.cfg = cfg
        self.mesh = mesh
        self.axis = axis
        self.tokens = layer.tokens
        self.capacity = layer.capacity
        ep = mesh.shape[axis]
        assert cfg.n_experts % ep == 0, "n_experts must divide ep"
        self.e_local = cfg.n_experts // ep
        arch = get_arch()
        if interpret is None:
            interpret = arch.is_cpu
        self._interpret = interpret
        self._mcfgs = {name: layer.ops[name].config
                       for name, _, _ in _EXPERT_PROJS}
        self._built = {}   # capacity -> shard_mapped fn (serving uses
        #                    several token counts: prefill S, decode B,
        #                    chunk B*T — each derives its own capacity)

        # Stack per-expert device-layout weights on a leading expert dim
        # and shard that dim over the ep axis.
        def stack_shard(parts):
            stacked = jnp.stack(parts)
            spec = P(axis, *([None] * (stacked.ndim - 1)))
            return jax.device_put(stacked, NamedSharding(mesh, spec))

        self.weights = {}
        for name, _, _ in _EXPERT_PROJS:
            Ws, Ss, Zs = zip(*layer.weights[name])
            self.weights[name] = (stack_shard(Ws), stack_shard(Ss),
                                  stack_shard(Zs))
        self.router = jax.device_put(
            layer.router, NamedSharding(mesh, P(None, None)))
        self._fn = self._build(self.capacity)

    def _build(self, cap: int):
        cfg, axis = self.cfg, self.axis
        e_local = self.e_local
        arch = get_arch()
        fns = {}
        for name, _, _ in _EXPERT_PROJS:
            spec = KernelSpec.from_config(self._mcfgs[name], cap)
            fns[name] = make_dequant_matmul(spec, default_hint(spec, arch),
                                            interpret=self._interpret)

        def f(x, router, Wg, Sg, Zg, Wu, Su, Zu, Wd, Sd, Zd):
            logits = x.astype(jnp.float32) @ router
            # all-zero rows (inactive slots / padding) are routing-invisible
            # — same exactness argument as QuantMoELayer.forward
            dispatch, combine = dispatch_combine(
                logits, cfg.top_k, cap, valid=jnp.any(x != 0, axis=-1))
            e0 = jax.lax.axis_index(axis) * e_local
            disp = jax.lax.dynamic_slice_in_dim(dispatch, e0, e_local, 1)
            comb = jax.lax.dynamic_slice_in_dim(combine, e0, e_local, 1)
            xin = jnp.einsum("tec,th->ech", disp.astype(x.dtype), x)
            outs = []
            for e in range(e_local):
                g = fns["gate"](xin[e], Wg[e], scales=Sg[e], zeros=Zg[e])
                u = fns["up"](xin[e], Wu[e], scales=Su[e], zeros=Zu[e])
                h = (jax.nn.silu(g.astype(jnp.float32))
                     * u.astype(jnp.float32)).astype(x.dtype)
                outs.append(fns["down"](h, Wd[e], scales=Sd[e], zeros=Zd[e]))
            y = jnp.einsum("tec,ech->th", comb,
                           jnp.stack(outs).astype(jnp.float32))
            return jax.lax.psum(y.astype(jnp.float32), axis)

        shard_dim = lambda a: P(axis, *([None] * (a.ndim - 1)))
        w_specs = []
        for name, _, _ in _EXPERT_PROJS:
            w_specs.extend(shard_dim(w) for w in self.weights[name])
        sm = shard_map(
            f, mesh=self.mesh,
            in_specs=(P(None, None), P(None, None), *w_specs),
            out_specs=P(None, None), check_vma=False)

        def fn(x):
            flat = []
            for name, _, _ in _EXPERT_PROJS:
                flat.extend(self.weights[name])
            return sm(x, self.router, *flat).astype(x.dtype)

        return fn

    def forward(self, x: jnp.ndarray) -> jnp.ndarray:
        """x [T, H] -> [T, H], any static T (QuantMoELayer semantics:
        capacity re-derives from the call shape, builds cached per cap)."""
        from ..models.quant_moe import moe_capacity
        cap = (self.capacity if x.shape[0] == self.tokens
               else moe_capacity(self.cfg, x.shape[0]))
        fn = self._built.get(cap)
        if fn is None:
            fn = self._built[cap] = (self._fn if cap == self.capacity
                                     else self._build(cap))
        return fn(x)


def expert_parallel_mixtral(model, mesh: Mesh, axis: str = "ep",
                            interpret: Optional[bool] = None):
    """Switch a QuantMixtral's expert FFNs to expert-parallel execution
    in place: each layer's routed MLP becomes an EPQuantMoELayer over
    `mesh[axis]` (experts sharded, ONE psum per layer joins the outputs).
    Attention stays replicated — compose with dp on another axis for
    batch scale-out. Returns the model. The original QuantMoELayer stays
    attached for checkpointing (state_dict format unchanged). Install
    AFTER loading weights — the EP twin snapshots them at construction
    and a later load_state_dict only updates the single-device copies."""
    for layer in model.layers:
        layer.moe_ep = EPQuantMoELayer(layer.moe, mesh, axis=axis,
                                       interpret=interpret)
    return model
