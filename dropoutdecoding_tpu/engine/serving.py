"""Continuous-batching decode server.

Production-serving layer the reference lacks entirely (its harness decodes
one image at a time to completion, chair_test.py:274-346).  The server
multiplexes up to ``n_slots`` concurrent dropout-decoding generations over
ONE jitted decode-step program:

- ``submit()`` prefills a request (the engine's existing single-request
  prefill program) and scatters its cache/uncertainty state into a free
  slot — requests join mid-flight without recompiling anything;
- ``step()`` advances every active slot by one token (the engine's
  ``_one_step`` with per-slot step counters);
- finished slots are harvested and immediately reusable.

All slot state lives on device; the host sees one small token vector per
step.  Works with every engine mode (exact / fused / int8) because it
reuses the engine's step function unchanged.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import llama as llama_mod
from .generate import PrefillState, TextMaskState


@dataclass
class DecodeServer:
    engine: Any
    n_slots: int = 8

    def __post_init__(self):
        eng = self.engine
        cfg = eng.cfg
        T = eng.gen.max_new_tokens
        S = self.n_slots
        N = eng.n_visual
        V = cfg.text.vocab_size
        dt = eng.param_dtype

        cache = llama_mod.empty_cache(
            cfg.text, S, eng.max_len, dt, quantized=getattr(eng, "int8_kv", False)
        )
        self._state = PrefillState(
            cache=cache,
            cur_len=jnp.ones((S,), jnp.int32),  # >=1 so masks stay sane
            last_logits=jnp.zeros((S, V), jnp.float32),
            first_token=jnp.zeros((S,), jnp.int32),
            epis=jnp.zeros((S, N), jnp.float32),
            topk_ids=jnp.full((S, N, eng.ens.topk), -1, jnp.int32),
            image_logits=jnp.zeros((S, N, 1), jnp.float32),
            image_pos=jnp.zeros((S,), jnp.int32),
            visual_mask=jnp.zeros((S, N), bool),
            probe_ids=jnp.full((S, 8), -1, jnp.int32),
            rng_id=jnp.zeros((S,), jnp.int32),
            uncertainty={},
        )
        self._carry = dict(
            cur_len=jnp.ones((S,), jnp.int32),
            token=jnp.zeros((S,), jnp.int32),
            steps=jnp.zeros((S,), jnp.int32),
            tokens_buf=jnp.full((S, T), eng.gen.pad_token_id, jnp.int32),
            done=jnp.ones((S,), bool),  # empty slots are "done"
            tm=TextMaskState(
                jnp.zeros((S, T), jnp.float32),
                jnp.zeros((S, T), jnp.float32),
                jnp.zeros((S, T), jnp.float32),
            ),
            prev_argmax0=jnp.zeros((S,), jnp.int32),
        )
        self._requests: List[Optional[Any]] = [None] * S
        self._step_fn = jax.jit(self._step_impl)
        if eng.ens.mask_policy == "epis_kl":
            raise ValueError(
                "epis_kl needs per-slot [N, V] image logits resident; "
                "use the per-request engine API for that policy"
            )

    # ------------------------------------------------------------------
    def free_slots(self) -> List[int]:
        return [i for i, r in enumerate(self._requests) if r is None]

    def submit(self, request_id, *prefill_args) -> int:
        """Prefill one request and place it into a free slot."""
        slots = self.free_slots()
        if not slots:
            raise RuntimeError("no free slots; call step()/harvest() first")
        slot = slots[0]
        ps = self.engine.prefill(*prefill_args)

        st = self._state
        self._state = PrefillState(
            cache=llama_mod.cache_copy_slot(st.cache, ps.cache, slot),
            cur_len=st.cur_len.at[slot].set(ps.cur_len[0]),
            last_logits=st.last_logits.at[slot].set(ps.last_logits[0]),
            first_token=st.first_token.at[slot].set(ps.first_token[0]),
            epis=st.epis.at[slot].set(ps.epis[0]),
            topk_ids=st.topk_ids.at[slot].set(ps.topk_ids[0]),
            image_logits=st.image_logits,  # not tracked (epis_kl unsupported)
            image_pos=st.image_pos.at[slot].set(ps.image_pos[0]),
            visual_mask=st.visual_mask.at[slot].set(ps.visual_mask[0]),
            probe_ids=st.probe_ids.at[slot].set(ps.probe_ids[0]),
            rng_id=st.rng_id.at[slot].set(ps.rng_id[0]),
            uncertainty={},
        )
        c = self._carry
        T = c["tokens_buf"].shape[1]
        c["cur_len"] = c["cur_len"].at[slot].set(ps.cur_len[0])
        c["token"] = c["token"].at[slot].set(ps.first_token[0])
        c["steps"] = c["steps"].at[slot].set(1)
        first_done = ps.first_token[0] == self.engine.gen.eos_token_id
        c["done"] = c["done"].at[slot].set(first_done)
        buf = jnp.full((T,), self.engine.gen.pad_token_id, jnp.int32)
        c["tokens_buf"] = c["tokens_buf"].at[slot].set(
            buf.at[0].set(ps.first_token[0])
        )
        c["tm"] = TextMaskState(
            c["tm"].prob.at[slot].set(0.0),
            c["tm"].ent.at[slot].set(0.0),
            c["tm"].vent.at[slot].set(0.0),
        )
        c["prev_argmax0"] = c["prev_argmax0"].at[slot].set(ps.first_token[0])
        self._requests[slot] = request_id
        return slot

    # ------------------------------------------------------------------
    def _step_impl(self, params, state, carry_tuple):
        return self.engine._one_step(params, state, carry_tuple)

    def step(self) -> None:
        """Advance all active slots by one token."""
        c = self._carry
        carry = (
            self._state.cache,
            c["cur_len"],
            c["token"],
            c["steps"],
            c["tokens_buf"],
            c["done"],
            c["tm"],
            c["prev_argmax0"],
        )
        out = self._step_fn(self.engine.params, self._state, carry)
        (cache, cur_len, token, steps, tokens_buf, done, tm, prev_argmax0) = out
        self._state = self._state._replace(cache=cache)
        self._carry.update(
            cur_len=cur_len,
            token=token,
            steps=steps,
            tokens_buf=tokens_buf,
            done=done,
            tm=tm,
            prev_argmax0=prev_argmax0,
        )

    def harvest(self) -> Dict[Any, np.ndarray]:
        """Collect finished requests (done, or step budget exhausted);
        their slots become free."""
        c = self._carry
        T = c["tokens_buf"].shape[1]
        done = np.asarray(c["done"])
        steps = np.asarray(c["steps"])
        finished = {}
        buf = None
        for slot, req in enumerate(self._requests):
            if req is None:
                continue
            if done[slot] or steps[slot] >= T:
                if buf is None:
                    buf = np.asarray(c["tokens_buf"])
                n = min(int(steps[slot]), T)
                finished[req] = buf[slot][:n]
                self._requests[slot] = None
                self._carry["done"] = self._carry["done"].at[slot].set(True)
        return finished

    def active(self) -> int:
        return sum(r is not None for r in self._requests)

    def run(self, requests, prefill_args_fn, max_steps=10_000):
        """Simple driver: feed `requests` through the slots to completion.

        Args:
          requests: list of request ids.
          prefill_args_fn: request id -> tuple of engine.prefill args.
        Returns:
          {request id: np.ndarray tokens}
        """
        pending = list(requests)
        results = {}
        steps = 0
        while (pending or self.active()) and steps < max_steps:
            while pending and self.free_slots():
                rid = pending.pop(0)
                self.submit(rid, *prefill_args_fn(rid))
            self.step()
            steps += 1
            results.update(self.harvest())
        return results
