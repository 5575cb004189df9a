"""Continuous-batching decode engine.

Minimal-but-real serving loop for quantized models (BASELINE.json config #5
asks for continuous batching; the reference delegates this to vLLM):

* a fixed pool of `num_slots` sequence slots backed by the static-shape KV
  cache (serving/kv_cache.py) — requests join/leave the batch between steps
  without retracing;
* `step()` runs one jitted decode step for every active slot (inactive slots
  are masked by their cache length and cost nothing semantically);
* prefill writes the prompt's K/V with bucketed-length jits.

The model plugs in via two callables (see models/quant_llama.decode_fns):
  prefill_fn(x [1, S, H], positions) -> (hidden, k_list, v_list)
  decode_fn(x [B, 1, H], caches, slots, lengths) -> (hidden, new_k, new_v)
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .kv_cache import init_kv_scales
from ..utils.lift import jit_lifted


@dataclasses.dataclass
class Request:
    uid: int
    prompt: np.ndarray          # [S, hidden] prompt hidden states (or tokens)
    max_new: int = 16
    generated: int = 0
    slot: int = -1
    done: bool = False
    final_hidden: "np.ndarray" = None   # snapshot at completion


class SlotAllocator:
    def __init__(self, num_slots: int):
        self.free = list(range(num_slots))[::-1]

    def alloc(self) -> Optional[int]:
        return self.free.pop() if self.free else None

    def release(self, slot: int):
        self.free.append(slot)


class ContinuousBatchingEngine:
    """Drives decode steps over a slot pool; host-side scheduling, jitted
    device steps. Works on CPU-interpret and real TPUs alike."""

    def __init__(self, model, num_slots: int, max_seq_len: int,
                 cache_sharding=None, kv_quant: bool = False,
                 prefill_chunk: int = 0, kv_ring: bool = False,
                 kv_ring_capacity: Optional[int] = None):
        """cache_sharding: optional jax Sharding for the [L, slots, S, Hkv,
        D] KV tensors (e.g. TPQuantLlama.kv_cache_sharding() to shard on
        kv_heads over a TP mesh). kv_quant=True stores the cache as int8
        codes + per-(token, head) f32 scales (kv_cache.py quantized
        section — halves KV HBM traffic and footprint); the model must
        expose decode_step_quant (QuantLlama and TPQuantLlama do).
        prefill_chunk=T admits prompts through `decode_chunk` in fixed
        T-token pieces: ONE compiled shape serves every prompt length
        instead of a jit per power-of-2 bucket — on hardware each Mosaic
        compile rides the tunnel for 20-60 s, so chunked prefill trades a
        little padding for most of that warmup.

        kv_ring=True (sliding-window models only): the cache rows become a
        window-sized rolling buffer (kv_cache.py ring section) — KV memory
        scales with cfg.sliding_window instead of max_seq_len. Requires
        prefill_chunk (prompts enter through decode_chunk, which handles
        the ring wrap; the one-shot prefill writer has no wrap path). The
        ring capacity R >= window + prefill_chunk - 1 also guarantees the
        chunked-prefill pad rows (garbage K/V past the prompt length) are
        never attended: a pad at absolute position g is only reachable
        through derived position g - R, which the window mask excludes
        exactly when R >= window + T - 1. kv_ring_capacity overrides the
        default 128-aligned capacity (still validated against the
        contract)."""
        self.model = model
        self.cfg = model.cfg
        self.num_slots = num_slots
        self.max_seq_len = max_seq_len
        self.kv_quant = kv_quant
        self.prefill_chunk = int(prefill_chunk)
        self.kv_ring = bool(kv_ring)
        if self.prefill_chunk and kv_quant and not hasattr(
                model, "decode_chunk_quant"):
            raise ValueError("prefill_chunk with kv_quant needs the model "
                             "to expose decode_chunk_quant")
        if self.kv_ring:
            if self.cfg.sliding_window is None:
                raise ValueError("kv_ring requires cfg.sliding_window")
            if not self.prefill_chunk:
                raise ValueError(
                    "kv_ring requires prefill_chunk > 0 (prompts must "
                    "enter through the wrap-aware decode_chunk path)")
            import inspect
            if "ring" not in inspect.signature(
                    model.decode_step).parameters:
                raise ValueError(
                    "kv_ring: this model's decode_step takes no ring= "
                    "kwarg (TP models are not ring-capable yet)")
        self.alloc = SlotAllocator(num_slots)
        self.active: Dict[int, Request] = {}
        self.pending: List[Request] = []
        self.finished: List[Request] = []

        c = self.cfg
        cache_rows = max_seq_len
        if self.kv_ring:
            from .kv_cache import ring_capacity
            if kv_ring_capacity is not None:
                cache_rows = int(kv_ring_capacity)
            else:
                cache_rows = min(ring_capacity(c.sliding_window,
                                               max(self.prefill_chunk, 1)),
                                 max_seq_len)
            if cache_rows < c.sliding_window + self.prefill_chunk - 1:
                raise ValueError(
                    f"kv_ring: ring capacity {cache_rows} (from "
                    f"{'kv_ring_capacity' if kv_ring_capacity is not None else 'max_seq_len'}) "
                    f"< window + prefill_chunk - 1 = "
                    f"{c.sliding_window + self.prefill_chunk - 1} — the "
                    "ring cannot satisfy the eviction contract; raise the "
                    "capacity, shrink prefill_chunk, or drop kv_ring")
        self.cache_rows = cache_rows
        kv_shape = (c.num_layers, num_slots, cache_rows, c.num_kv_heads,
                    c.head_dim)
        self.caches_k = jnp.zeros(kv_shape,
                                  jnp.int8 if kv_quant else jnp.bfloat16)
        if cache_sharding is not None:
            self.caches_k = jax.device_put(self.caches_k, cache_sharding)
        self.caches_v = jnp.zeros_like(self.caches_k)
        if kv_quant:
            # scales shard on the same kv_heads axis when the cache does
            self.scales_k = init_kv_scales(kv_shape, cache_sharding)
            self.scales_v = jnp.zeros_like(self.scales_k)
        self.lengths = np.zeros((num_slots,), np.int32)
        self.last_hidden = jnp.zeros((num_slots, c.hidden_size), jnp.float16)

        self._decode_step = jit_lifted(self._make_decode_step(),
                                       self.model)
        self._prefills = {}

    # -- request lifecycle -----------------------------------------------------
    def submit(self, req: Request):
        S = req.prompt.shape[0]
        if S > self.max_seq_len:
            raise ValueError(
                f"prompt length {S} exceeds max_seq_len {self.max_seq_len}")
        self.pending.append(req)

    def _admit(self):
        while self.pending:
            slot = self.alloc.alloc()
            if slot is None:
                return
            req = self.pending.pop(0)
            req.slot = slot
            self._prefill(req)
            self.active[slot] = req

    def _prefill_fn_for(self, s_bucket: int):
        if s_bucket not in self._prefills:
            self._prefills[s_bucket] = jit_lifted(
                self.model.make_prefill(s_bucket), self.model)
        return self._prefills[s_bucket]

    def _prefill(self, req: Request):
        if self.prefill_chunk:
            return self._prefill_chunked(req)
        S = req.prompt.shape[0]
        bucket = 1 << (max(S - 1, 0)).bit_length() if S > 1 else 1
        bucket = min(bucket, self.max_seq_len)
        x = np.zeros((1, bucket, self.cfg.hidden_size), np.float16)
        x[0, :S] = req.prompt
        positions = np.arange(bucket)[None, :]
        hidden, ks, vs = self._prefill_fn_for(bucket)(
            jnp.asarray(x), jnp.asarray(positions))
        # Write prompt K/V into the slot (only the first S rows are valid).
        # One jitted update with donated caches: the per-layer eager
        # dynamic_update_slice loop copied the ENTIRE cache 2*num_layers
        # times per admitted request.
        if not hasattr(self, "_cache_writer"):
            import functools as _ft

            @_ft.partial(jax.jit, donate_argnums=(0, 1))
            def _write(ck, cv, k, v, slot):
                k = k.astype(ck.dtype)[:, None]
                v = v.astype(cv.dtype)[:, None]
                ck = jax.lax.dynamic_update_slice(ck, k, (0, slot, 0, 0, 0))
                cv = jax.lax.dynamic_update_slice(cv, v, (0, slot, 0, 0, 0))
                return ck, cv

            @_ft.partial(jax.jit, donate_argnums=(0, 1, 2, 3))
            def _write_q(ck, cv, sk, sv, k, v, slot):
                from .kv_cache import quantize_kv
                kq, ksc = quantize_kv(k)
                vq, vsc = quantize_kv(v)
                ck = jax.lax.dynamic_update_slice(ck, kq[:, None],
                                                  (0, slot, 0, 0, 0))
                cv = jax.lax.dynamic_update_slice(cv, vq[:, None],
                                                  (0, slot, 0, 0, 0))
                sk = jax.lax.dynamic_update_slice(sk, ksc[:, None],
                                                  (0, slot, 0, 0))
                sv = jax.lax.dynamic_update_slice(sv, vsc[:, None],
                                                  (0, slot, 0, 0))
                return ck, cv, sk, sv
            self._cache_writer = _write
            self._cache_writer_q = _write_q
        if self.kv_quant:
            (self.caches_k, self.caches_v, self.scales_k,
             self.scales_v) = self._cache_writer_q(
                self.caches_k, self.caches_v, self.scales_k, self.scales_v,
                jnp.stack(list(ks)), jnp.stack(list(vs)),
                jnp.int32(req.slot))
        else:
            self.caches_k, self.caches_v = self._cache_writer(
                self.caches_k, self.caches_v, jnp.stack(list(ks)),
                jnp.stack(list(vs)), jnp.int32(req.slot))
        self.lengths[req.slot] = S
        self.last_hidden = self.last_hidden.at[req.slot].set(
            hidden[0, S - 1].astype(self.last_hidden.dtype))

    def _prefill_chunked(self, req: Request):
        """Admit a prompt through fixed-T decode_chunk calls. The tail
        chunk is zero-padded: pad rows write garbage K/V past the
        sequence length, which the length-masked attention never reads
        and later appends overwrite."""
        T = self.prefill_chunk
        S = req.prompt.shape[0]
        if not hasattr(self, "_chunk_step"):
            import functools as _ft
            if self.kv_quant:
                fn = self.model.decode_chunk_quant
                if self.kv_ring:
                    fn = _ft.partial(fn, ring=True)
                self._chunk_step = jit_lifted(fn, self.model,
                                              donate_argnums=(1, 2, 3, 4))
            else:
                fn = self.model.decode_chunk
                if self.kv_ring:
                    fn = _ft.partial(fn, ring=True)
                self._chunk_step = jit_lifted(fn, self.model,
                                              donate_argnums=(1, 2))
        slots = jnp.asarray([req.slot], jnp.int32)
        prompt = np.asarray(req.prompt, np.float16)
        written = 0
        hidden = None
        n = 0
        while written < S:
            n = min(T, S - written)
            x = np.zeros((1, T, self.cfg.hidden_size), np.float16)
            x[0, :n] = prompt[written:written + n]
            start = jnp.asarray([written], jnp.int32)
            if self.kv_quant:
                (hidden, self.caches_k, self.caches_v, self.scales_k,
                 self.scales_v) = self._chunk_step(
                    jnp.asarray(x), self.caches_k, self.caches_v,
                    self.scales_k, self.scales_v, slots, start)
            else:
                hidden, self.caches_k, self.caches_v = self._chunk_step(
                    jnp.asarray(x), self.caches_k, self.caches_v, slots,
                    start)
            written += n
        self.lengths[req.slot] = S
        self.last_hidden = self.last_hidden.at[req.slot].set(
            hidden[0, n - 1].astype(self.last_hidden.dtype))

    def _make_decode_step(self):
        model = self.model
        # only thread ring= through when set: TP models (TPQuantLlama)
        # take no ring kwarg and must keep working with kv_ring=False
        kw = {"ring": True} if self.kv_ring else {}

        if self.kv_quant:
            def step_q(x, caches_k, caches_v, scales_k, scales_v, slots,
                       lengths):
                return model.decode_step_quant(
                    x[:, None, :], caches_k, caches_v, scales_k, scales_v,
                    slots, lengths, **kw)
            return step_q

        def step(x, caches_k, caches_v, slots, lengths):
            # x [num_slots, hidden] -> one token step for every slot.
            return model.decode_step(x[:, None, :], caches_k, caches_v,
                                     slots, lengths, **kw)

        return step

    # -- main loop ---------------------------------------------------------------
    def _run_decode(self) -> None:
        """One jitted decode step over every slot; updates caches and
        last_hidden in place. Shared by the hidden-state and token loops."""
        slots = jnp.arange(self.num_slots, dtype=jnp.int32)
        lengths = jnp.asarray(self.lengths)
        if self.kv_quant:
            (hidden, self.caches_k, self.caches_v, self.scales_k,
             self.scales_v) = self._decode_step(
                self.last_hidden, self.caches_k, self.caches_v,
                self.scales_k, self.scales_v, slots, lengths)
        else:
            hidden, self.caches_k, self.caches_v = self._decode_step(
                self.last_hidden, self.caches_k, self.caches_v, slots,
                lengths)
        self.last_hidden = hidden[:, 0, :].astype(self.last_hidden.dtype)

    def step(self) -> int:
        """One decode step across all active slots; returns #active."""
        self._admit()
        if not self.active:
            return 0
        self._run_decode()

        finished_slots = []
        for slot, req in list(self.active.items()):
            self.lengths[slot] += 1
            req.generated += 1
            if (req.generated >= req.max_new
                    or self.lengths[slot] >= self.max_seq_len):
                req.done = True
                req.final_hidden = np.asarray(self.last_hidden[slot],
                                              np.float32)
                self.finished.append(req)
                finished_slots.append(slot)
        for slot in finished_slots:
            del self.active[slot]
            self.lengths[slot] = 0
            # Zero the slot's hidden state: released slots still flow
            # through the (masked) batched decode step, and stale values
            # would keep accumulating through residuals until f16 overflow.
            self.last_hidden = self.last_hidden.at[slot].set(0.0)
            self.alloc.release(slot)
        return len(self.active)

    def run_to_completion(self, max_steps: int = 10_000) -> List[Request]:
        for _ in range(max_steps):
            self._admit()
            if not self.active and not self.pending:
                break
            self.step()
        return self.finished


class PagedContinuousBatchingEngine:
    """Continuous batching over a paged (block-pooled) KV cache.

    Memory scales with live tokens instead of num_slots * max_seq_len: the
    host-side BlockAllocator hands fixed-size blocks to requests as their
    sequences grow and reclaims them on completion. Admission waits when the
    pool is exhausted. Device shapes stay static (block tables are
    [num_slots, max_blocks] arrays), so steps never retrace.
    """

    def __init__(self, model, num_slots: int, num_blocks: int,
                 block_size: int = 16, max_blocks_per_slot: int = 64,
                 cache_sharding=None, prefix_caching: bool = True,
                 kv_quant: bool = False):
        from .kv_cache import BlockAllocator
        self.model = model
        self.cfg = model.cfg
        self.num_slots = num_slots
        self.block_size = block_size
        self.max_blocks = max_blocks_per_slot
        self.prefix_caching = prefix_caching
        self.kv_quant = kv_quant
        self.slot_alloc = SlotAllocator(num_slots)
        # Physical block 0 is reserved: it is the filler id in masked table
        # entries AND the write target for inactive slots' appends (their
        # block_rows resolve to table[slot, 0] = 0), so it must never hold
        # live data.
        self.block_alloc = BlockAllocator(num_blocks)
        self.block_alloc.free.remove(0)
        self.active: Dict[int, Request] = {}
        self.pending: List[Request] = []
        self.finished: List[Request] = []

        c = self.cfg
        kv_shape = (c.num_layers, num_blocks, block_size, c.num_kv_heads,
                    c.head_dim)
        self.caches_k = jnp.zeros(kv_shape,
                                  jnp.int8 if kv_quant else jnp.bfloat16)
        if cache_sharding is not None:
            self.caches_k = jax.device_put(self.caches_k, cache_sharding)
        self.caches_v = jnp.zeros_like(self.caches_k)
        if kv_quant:
            self.scales_k = init_kv_scales(kv_shape, cache_sharding)
            self.scales_v = jnp.zeros_like(self.scales_k)
        self.lengths = np.zeros((num_slots,), np.int32)
        # block 0 stays a valid physical id for masked/unused table slots
        self.tables = np.zeros((num_slots, max_blocks_per_slot), np.int32)
        self.slot_blocks: Dict[int, List[int]] = {}
        self.last_hidden = jnp.zeros((num_slots, c.hidden_size), jnp.float16)
        self._decode_step = jit_lifted(
            model.decode_step_paged_quant if kv_quant
            else model.decode_step_paged, model)
        self._prefills = {}
        # Prefix caching: full prompt-prefix blocks are content-addressed
        # (hash chain over the prompt) and shared between requests via
        # refcounts. Shared blocks are never written: appends only touch the
        # partial tail block or freshly grown ones.
        self.block_ref: Dict[int, int] = {}
        self.prefix_index: Dict[bytes, int] = {}
        self.block_key: Dict[int, bytes] = {}
        self.prefix_hits = 0

    # -- block bookkeeping ------------------------------------------------------
    def _blocks_needed(self, tokens: int) -> int:
        return -(-tokens // self.block_size)

    def _grow_slot(self, slot: int, new_len: int) -> bool:
        """Ensure the slot owns enough blocks for new_len tokens."""
        have = self.slot_blocks.get(slot, [])
        need = self._blocks_needed(new_len)
        if need > self.max_blocks:
            return False
        while len(have) < need:
            b = self.block_alloc.alloc()
            if b is None:
                return False
            self.block_ref[b] = 1
            self.tables[slot, len(have)] = b
            have.append(b)
        self.slot_blocks[slot] = have
        return True

    def _unref(self, b: int):
        self.block_ref[b] -= 1
        if self.block_ref[b] == 0:
            del self.block_ref[b]
            key = self.block_key.pop(b, None)
            if key is not None:
                self.prefix_index.pop(key, None)
            self.block_alloc.release([b])

    def _release_slot(self, slot: int):
        for b in self.slot_blocks.pop(slot, []):
            self._unref(b)
        self.tables[slot, :] = 0
        self.lengths[slot] = 0
        self.last_hidden = self.last_hidden.at[slot].set(0.0)
        self.slot_alloc.release(slot)

    # -- request lifecycle -------------------------------------------------------
    def submit(self, req: Request):
        self.pending.append(req)

    def _admit(self):
        while self.pending:
            req = self.pending[0]
            S = req.prompt.shape[0]
            if (self.block_alloc.available
                    < self._blocks_needed(S + req.max_new)):
                return  # pool exhausted: wait for completions
            slot = self.slot_alloc.alloc()
            if slot is None:
                return
            self.pending.pop(0)
            req.slot = slot
            ok = self._grow_slot(slot, S)
            assert ok, "admission check guaranteed blocks"
            self._prefill(req)
            self.active[slot] = req

    def _prefix_keys(self, prompt: np.ndarray):
        """Hash-chain keys for each FULL block of the prompt: key_i covers
        tokens [0, (i+1)*bs) — identical prefixes map to identical keys."""
        import hashlib
        bs = self.block_size
        keys = []
        h = hashlib.sha1()
        for i in range(prompt.shape[0] // bs):
            h.update(np.ascontiguousarray(prompt[i * bs:(i + 1) * bs])
                     .tobytes())
            keys.append(h.digest())
        return keys

    def _prefill(self, req: Request):
        S = req.prompt.shape[0]
        bs = self.block_size
        slot = req.slot
        # Swap shared prefix blocks in for the private ones _grow_slot
        # handed us (shared full blocks are never written, so reuse is safe).
        blocks = self.slot_blocks[slot]
        write_mask = [True] * len(blocks)
        keys = self._prefix_keys(req.prompt) if self.prefix_caching else []
        for i, key in enumerate(keys):
            shared = self.prefix_index.get(key)
            if shared is not None and shared != blocks[i]:
                self._unref(blocks[i])
                self.block_ref[shared] += 1
                blocks[i] = shared
                self.tables[slot, i] = shared
                write_mask[i] = False
                self.prefix_hits += 1
            else:
                # register this (private) block as the prefix owner
                if self.prefix_caching and blocks[i] not in self.block_key:
                    self.prefix_index[key] = blocks[i]
                    self.block_key[blocks[i]] = key
        self.slot_blocks[slot] = blocks

        bucket = 1 << (max(S - 1, 0)).bit_length() if S > 1 else 1
        x = np.zeros((1, bucket, self.cfg.hidden_size), np.float16)
        x[0, :S] = req.prompt
        positions = np.arange(bucket)[None, :]
        if bucket not in self._prefills:
            self._prefills[bucket] = jit_lifted(
                self.model.make_prefill(bucket), self.model)
        hidden, ks, vs = self._prefills[bucket](jnp.asarray(x),
                                                jnp.asarray(positions))
        # Scatter the prompt K/V into the slot's (private) blocks with ONE
        # jitted donated update (the eager per-layer-per-block .at[].set
        # loop copied the entire block pool L*nb times per request). Rows
        # past S in the tail block hold prompt-padding K/V; decode masks by
        # length, and appends overwrite them in place.
        if not hasattr(self, "_paged_writer"):
            import functools as _ft

            @_ft.partial(jax.jit, donate_argnums=(0, 1),
                         static_argnames=("nb",))
            def _pwrite(ck, cv, k, v, blocks_a, mask_a, nb):
                L, bsz = ck.shape[0], ck.shape[2]
                pad = nb * bsz - k.shape[1]
                if pad > 0:
                    pw = ((0, 0), (0, pad), (0, 0), (0, 0))
                    k = jnp.pad(k, pw)
                    v = jnp.pad(v, pw)
                k = k[:, :nb * bsz].reshape(L, nb, bsz, *k.shape[2:])
                v = v[:, :nb * bsz].reshape(L, nb, bsz, *v.shape[2:])

                def body(i, carry):
                    ck, cv = carry

                    def upd(c, t):
                        return jax.lax.dynamic_update_slice(
                            c, t[:, i][:, None].astype(c.dtype),
                            (0, blocks_a[i], 0, 0, 0))
                    return jax.lax.cond(
                        mask_a[i],
                        lambda a: (upd(a[0], k), upd(a[1], v)),
                        lambda a: a, (ck, cv))
                return jax.lax.fori_loop(0, nb, body, (ck, cv))
            self._paged_writer = _pwrite

            @_ft.partial(jax.jit, donate_argnums=(0, 1, 2, 3),
                         static_argnames=("nb",))
            def _pwrite_q(ck, cv, sk, sv, k, v, blocks_a, mask_a, nb):
                from .kv_cache import quantize_kv
                L, bsz = ck.shape[0], ck.shape[2]
                pad = nb * bsz - k.shape[1]
                if pad > 0:
                    pw = ((0, 0), (0, pad), (0, 0), (0, 0))
                    k = jnp.pad(k, pw)
                    v = jnp.pad(v, pw)
                kq, ksc = quantize_kv(k[:, :nb * bsz])
                vq, vsc = quantize_kv(v[:, :nb * bsz])
                kq = kq.reshape(L, nb, bsz, *kq.shape[2:])
                vq = vq.reshape(L, nb, bsz, *vq.shape[2:])
                ksc = ksc.reshape(L, nb, bsz, ksc.shape[-1])
                vsc = vsc.reshape(L, nb, bsz, vsc.shape[-1])

                def body(i, carry):
                    ck, cv, sk, sv = carry

                    def upd(c, t, idx):
                        return jax.lax.dynamic_update_slice(
                            c, t[:, i][:, None].astype(c.dtype), idx)
                    i5 = (0, blocks_a[i], 0, 0, 0)
                    i4 = (0, blocks_a[i], 0, 0)
                    return jax.lax.cond(
                        mask_a[i],
                        lambda a: (upd(a[0], kq, i5), upd(a[1], vq, i5),
                                   upd(a[2], ksc, i4), upd(a[3], vsc, i4)),
                        lambda a: a, (ck, cv, sk, sv))
                return jax.lax.fori_loop(0, nb, body, (ck, cv, sk, sv))
            self._paged_writer_q = _pwrite_q

        nb = len(blocks)
        mask_np = np.asarray([bool(write_mask[i]) and i * bs < S
                              for i in range(nb)])
        if self.kv_quant:
            (self.caches_k, self.caches_v, self.scales_k,
             self.scales_v) = self._paged_writer_q(
                self.caches_k, self.caches_v, self.scales_k, self.scales_v,
                jnp.stack(list(ks)), jnp.stack(list(vs)),
                jnp.asarray(blocks, jnp.int32), jnp.asarray(mask_np), nb=nb)
        else:
            self.caches_k, self.caches_v = self._paged_writer(
                self.caches_k, self.caches_v, jnp.stack(list(ks)),
                jnp.stack(list(vs)), jnp.asarray(blocks, jnp.int32),
                jnp.asarray(mask_np), nb=nb)
        self.lengths[req.slot] = S
        self.last_hidden = self.last_hidden.at[req.slot].set(
            hidden[0, S - 1].astype(self.last_hidden.dtype))

    # -- main loop ----------------------------------------------------------------
    def step(self) -> int:
        self._admit()
        if not self.active:
            return 0
        # grow blocks for this step's appends
        for slot in list(self.active):
            if not self._grow_slot(slot, int(self.lengths[slot]) + 1):
                # out of pool mid-flight: finish the request early
                req = self.active.pop(slot)
                req.done = True
                req.final_hidden = np.asarray(self.last_hidden[slot],
                                              np.float32)
                self.finished.append(req)
                self._release_slot(slot)
        if not self.active:
            return 0
        lengths = self.lengths
        bs = self.block_size
        block_idx = lengths // bs
        block_rows = self.tables[np.arange(self.num_slots), block_idx]
        offsets = lengths % bs
        if self.kv_quant:
            (hidden, self.caches_k, self.caches_v, self.scales_k,
             self.scales_v) = self._decode_step(
                self.last_hidden[:, None, :], self.caches_k, self.caches_v,
                self.scales_k, self.scales_v, jnp.asarray(self.tables),
                jnp.asarray(block_rows), jnp.asarray(offsets),
                jnp.asarray(lengths))
        else:
            hidden, self.caches_k, self.caches_v = self._decode_step(
                self.last_hidden[:, None, :], self.caches_k, self.caches_v,
                jnp.asarray(self.tables), jnp.asarray(block_rows),
                jnp.asarray(offsets), jnp.asarray(lengths))
        self.last_hidden = hidden[:, 0, :].astype(self.last_hidden.dtype)

        for slot, req in list(self.active.items()):
            self.lengths[slot] += 1
            req.generated += 1
            if req.generated >= req.max_new:
                req.done = True
                req.final_hidden = np.asarray(self.last_hidden[slot],
                                              np.float32)
                self.finished.append(req)
                del self.active[slot]
                self._release_slot(slot)
        return len(self.active)

    def run_to_completion(self, max_steps: int = 10_000) -> List[Request]:
        for _ in range(max_steps):
            self._admit()
            if not self.active and not self.pending:
                break
            self.step()
        return self.finished


class DataParallelEngineGroup:
    """Continuous batching across hosts/replicas (BASELINE.json: the DCN
    tier of the serving stack).

    Each replica is its own engine over its own model/mesh slice — the
    TPU-native layout keeps KV caches strictly replica-local, so the only
    cross-host traffic is requests in and results out (host-side Python,
    riding DCN in a real deployment). This group is that router: it admits
    each request to the least-loaded replica, steps every replica per tick,
    and aggregates completions. Works with any engine class above
    (slot/paged, float or kv_quant, single-device or TP-sharded).
    """

    def __init__(self, engines):
        assert engines, "need at least one replica engine"
        self.engines = list(engines)

    def _load(self, eng) -> int:
        return len(eng.active) + len(eng.pending)

    def submit(self, req: Request):
        eng = min(self.engines, key=self._load)
        eng.submit(req)

    def submit_tokens(self, uid: int, tokens, **kw) -> "TokenRequest":
        """Route a token request to the least-loaded replica (replicas must
        be TokenContinuousBatchingEngines)."""
        eng = min(self.engines, key=self._load)
        return eng.submit_tokens(uid, tokens, **kw)

    def step(self) -> int:
        return sum(eng.step() for eng in self.engines)

    @property
    def finished(self):
        out = []
        for eng in self.engines:
            out.extend(eng.finished)
        return out

    def run_to_completion(self, max_steps: int = 10_000):
        for _ in range(max_steps):
            if not any(eng.active or eng.pending for eng in self.engines):
                break
            self.step()
        return self.finished


@dataclasses.dataclass
class TokenRequest(Request):
    """A `Request` whose prompt arrived as token ids and whose output is
    sampled token ids (`out_tokens`). Built by
    `TokenContinuousBatchingEngine.submit_tokens` — `prompt` holds the
    embedded tokens so the base slot/prefill machinery applies unchanged."""
    tokens: np.ndarray = None
    temperature: float = 0.0
    top_k: int = 0
    eos_token_id: Optional[int] = None
    seed: int = 0
    out_tokens: List[int] = dataclasses.field(default_factory=list)


class TokenContinuousBatchingEngine(ContinuousBatchingEngine):
    """Token-in/token-out continuous batching: the LM head joins the loop.

    The base engine streams hidden states (each slot's previous hidden is
    fed back as the next input — fine for kernel benchmarking, not a
    language model). This subclass closes the loop the way a serving stack
    does: after every decode step the batch of last hiddens goes through
    `head.logits`, each active request samples its next token
    (greedy / temperature / top_k, per-request seeded rng), completion
    honors `eos_token_id`, and the sampled tokens' embeddings become the
    next step's inputs. `head` duck-types models.hf_import.LMHead
    (`embed_tokens` + `logits`).

    The reference delegates all of this to vLLM around its torch layers
    (/root/reference/integration/vLLM/README.md); here it is first-class.
    """

    def __init__(self, model, head, num_slots: int, max_seq_len: int,
                 **kw):
        super().__init__(model, num_slots, max_seq_len, **kw)
        self.head = head
        self._rngs: Dict[int, np.random.Generator] = {}

    # -- request intake ----------------------------------------------------------
    def submit_tokens(self, uid: int, tokens, max_new: int = 16, *,
                      temperature: float = 0.0, top_k: int = 0,
                      eos_token_id: Optional[int] = None,
                      seed: int = 0) -> TokenRequest:
        toks = np.asarray(tokens).reshape(-1).astype(np.int32)
        if toks.size < 1:
            raise ValueError("prompt must hold at least one token")
        if max_new < 1:
            raise ValueError("max_new must be >= 1")
        embeds = np.asarray(self.head.embed_tokens(jnp.asarray(toks)),
                            np.float16)
        req = TokenRequest(uid=uid, prompt=embeds, max_new=max_new,
                           tokens=toks, temperature=temperature,
                           top_k=top_k, eos_token_id=eos_token_id,
                           seed=seed)
        self.submit(req)
        return req

    # -- sampling ----------------------------------------------------------------
    def _sample(self, req: TokenRequest, logits_row: np.ndarray) -> int:
        from ..models.hf_import import sample_token
        rng = self._rngs.get(req.uid)
        if rng is None:
            rng = self._rngs[req.uid] = np.random.default_rng(req.seed)
        return sample_token(logits_row, temperature=req.temperature,
                            top_k=req.top_k, rng=rng)

    def _emit_token(self, req: TokenRequest) -> bool:
        """Sample req's next token from its slot's last hidden; return
        True when the request is complete (eos / budget)."""
        slot = req.slot
        logits = np.asarray(self.head.logits(
            self.last_hidden[slot][None].astype(jnp.float32)))[0]
        tok = self._sample(req, logits)
        req.out_tokens.append(tok)
        req.generated += 1
        done = (req.generated >= req.max_new
                or self.lengths[slot] >= self.max_seq_len
                or (req.eos_token_id is not None
                    and tok == req.eos_token_id))
        if not done:
            self.last_hidden = self.last_hidden.at[slot].set(
                self.head.embed_tokens(jnp.asarray(tok)).astype(
                    self.last_hidden.dtype))
        return done

    def _finish(self, req: Request) -> None:
        slot = req.slot
        req.done = True
        req.final_hidden = np.asarray(self.last_hidden[slot], np.float32)
        self.finished.append(req)
        self._rngs.pop(req.uid, None)
        self.active.pop(slot, None)
        self.lengths[slot] = 0
        self.last_hidden = self.last_hidden.at[slot].set(0.0)
        self.alloc.release(slot)

    # -- lifecycle overrides -------------------------------------------------------
    def _admit(self):
        # Base loop, plus: the prompt's final hidden immediately yields the
        # first sampled token (no decode step spent on it); a request whose
        # budget is 1 token (or that hits eos at once) never occupies the
        # batch.
        while self.pending:
            slot = self.alloc.alloc()
            if slot is None:
                return
            req = self.pending.pop(0)
            req.slot = slot
            self._prefill(req)
            if isinstance(req, TokenRequest) and self._emit_token(req):
                self._finish(req)
            else:
                self.active[slot] = req

    def step(self) -> int:
        self._admit()
        if not self.active:
            return 0
        self._run_decode()  # shared base dispatch (float or kv_quant)

        # One batched head pass (only when any token request is active),
        # then per-request sampling. Plain hidden-state Requests keep the
        # base engine's behavior: their hidden feeds back unchanged.
        any_tok = any(isinstance(r, TokenRequest)
                      for r in self.active.values())
        logits = np.asarray(self.head.logits(
            self.last_hidden[:, None, :].astype(jnp.float32)))[:, 0] \
            if any_tok else None
        continue_slots: List[int] = []
        continue_toks: List[int] = []
        finished: List[Request] = []
        for slot, req in list(self.active.items()):
            self.lengths[slot] += 1
            req.generated += 1
            if isinstance(req, TokenRequest):
                tok = self._sample(req, logits[slot])
                req.out_tokens.append(tok)
                if (req.generated >= req.max_new
                        or self.lengths[slot] >= self.max_seq_len
                        or (req.eos_token_id is not None
                            and tok == req.eos_token_id)):
                    finished.append(req)
                else:
                    continue_slots.append(slot)
                    continue_toks.append(tok)
            elif (req.generated >= req.max_new
                    or self.lengths[slot] >= self.max_seq_len):
                finished.append(req)
        for req in finished:
            self._finish(req)
        if continue_slots:
            emb = self.head.embed_tokens(jnp.asarray(continue_toks))
            self.last_hidden = self.last_hidden.at[
                jnp.asarray(continue_slots)].set(
                emb.astype(self.last_hidden.dtype))
        return len(self.active)
