"""Continuous-batching TTS serving engine.

The TPU-native analog of the reference's optional vLLM serving path
(reference: cosy_repo/cosyvoice/vllm/cosyvoice2.py:29, cli/model.py:289-298):
concurrent requests share one fixed-capacity slot-batched LM decode
(models/llm.py slots_*), joining and leaving at chunk boundaries, while each
request owns a chunk-cached flow/HiFT session (runtime/model.py machinery).
One background thread drives the device; callers stream audio chunks off
per-request queues.

    engine = TTSEngine(api._model, n_slots=4)
    handle = engine.submit(prompt_inputs)
    for chunk in handle:           # np.float32 audio chunks
        play(chunk)

Latency architecture (r5): admission is a pure prefill dispatch (sessions
are lazy — no flow priming at stage time); first emissions across sessions
share ONE batched flow recompute + ONE batched HiFT; steady-state sessions
vocode in ONE slot-batched fused dispatch per iteration, with chunk sizes
escalating 25 -> 50 -> 100 tokens as each stream builds lead (the cached
chunk's device cost is op-count-bound, so bigger chunks divide per-second
vocode cost).  Measured on a v5e (BENCH_r05): 4-stream warm TTFA 0.35 s,
engine RTF 0.073 = 1.5x the single-stream non-streaming RTF.
"""

from __future__ import annotations

import queue
import threading
from dataclasses import dataclass, field
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from cosyvoice2_eu_tpu.models import llm as llm_mod
from cosyvoice2_eu_tpu.runtime.aot_cache import aot_jit
from cosyvoice2_eu_tpu.runtime.model import PromptInputs, bucket_for


class StreamSession:
    """Per-request token -> audio state machine (the flow/HiFT half of the
    cached streaming path, reference token2wav schedule cli/model.py:353-381)."""

    def __init__(self, model, prompt: PromptInputs, speed: float = 1.0):
        self.model = model
        self.prompt = prompt
        # speed != 1.0 is non-stream-only (reference assertion, cli/model.py):
        # keep the LM decode slot-batched but render flow/HiFT once at the
        # end with mel interpolation instead of chunk-incrementally.
        self.speed = speed
        self.single_shot = speed != 1.0
        cfg = model.cfg
        self.ratio = cfg.flow.token_mel_ratio
        self.hop = model.token_hop_len
        self.la = model.pre_lookahead_len
        self.P = len(prompt.flow_prompt_speech_tokens)
        self.prompt_pad = int(np.ceil(self.P / self.hop) * self.hop - self.P)
        self.prompt_mel = self.P * self.ratio
        self.session: dict = {"hift_cache": None}
        self.sparams = None if self.single_shot else model._get_stream_params()

        prompt_only = model._prompt_prime_len(self.P, self.hop, self.la)
        # LAZY state: no flow dispatches until the first emission.  The first
        # chunk goes through the one-dispatch recompute program (same trick
        # as the direct path, runtime/model.py _tts_stream_cached first
        # chunk); the cached state is primed and caught up behind the
        # already-yielded audio.  Session construction is pure host work, so
        # engine staging never serializes priming across requests.
        self.fstate = None
        self.first_pending = not self.single_shot
        self.gen_base = 0  # generated tokens rolled out of the state window
        self.t_fed = prompt_only
        self.next_feed = (self.P - prompt_only) + self.prompt_pad + self.hop
        self.this_hop = self.hop + self.prompt_pad
        self.emitted = 0
        self.mel_buf = np.zeros((1, cfg.flow.output_size, 0), np.float32)
        self.done = False

    def _combined(self, i0: int, n: int, gen: np.ndarray) -> np.ndarray:
        """tokens [i0, i0+n) of prompt ++ generated, in STATE coordinates:
        after a rollover, state position i >= P maps to gen[gen_base + i-P]."""
        out = np.zeros(n, np.int32)
        for k in range(n):
            i = i0 + k
            out[k] = (
                self.prompt.flow_prompt_speech_tokens[i]
                if i < self.P else gen[self.gen_base + i - self.P]
            )
        return out

    def _can_rollover(self, gen_tokens: np.ndarray, lm_finished: bool) -> bool:
        model = self.model
        return (
            model.stream_rollover
            and self.P + model.stream_rollover_window + 2 * self.hop
            <= model.stream_max_tokens
            and (
                not lm_finished
                or len(gen_tokens) - self.emitted > 2 * self.hop
            )
        )

    def _rollover(self, gen_tokens: np.ndarray):
        """Fresh cached state over [prompt ++ last window of generated]
        (mirrors runtime/model.py _tts_stream_cached rollover)."""
        model = self.model
        hop = self.hop
        prompt_only = model._prompt_prime_len(self.P, hop, self.la)
        g_fed = self.gen_base + (self.t_fed - self.P)
        # align the window so the catch-up decomposes into PRIME_SIZES feeds
        base = self.P - prompt_only
        w = model.stream_rollover_window
        w += (-(base + w)) % hop
        j0 = max(0, g_fed - w)
        self.fstate, _ = model._primed_flow_state(self.prompt)
        self.gen_base = j0
        t = prompt_only
        total = self.P + (g_fed - j0)
        for n in model._decompose_feed(total - prompt_only):
            self._feed(t, n, gen_tokens, materialize=False)
            t += n
        self.t_fed = total

    def _feed(self, t0: int, n: int, gen: np.ndarray, materialize: bool = True):
        cfg = self.model.cfg
        tok = self._combined(t0, n, gen)[None]
        ctx = self._combined(t0 + n, self.la, gen)[None]
        cond = np.zeros((1, n * self.ratio, cfg.flow.output_size), np.float32)
        lo = t0 * self.ratio
        if lo < self.prompt_mel:
            take = min(n * self.ratio, self.prompt_mel - lo)
            cond[0, :take] = self.prompt.prompt_feat[lo : lo + take]
        mel, self.fstate = self.model._flow_chunk_fn(n)(
            self.sparams, self.fstate, jnp.asarray(tok), jnp.asarray(ctx),
            jnp.asarray(self.prompt.embedding[None]), jnp.asarray(cond),
        )
        return np.asarray(mel) if materialize else mel

    def feed(self, gen_tokens: np.ndarray, lm_finished: bool,
             fetch: bool = True) -> list:
        """Consume the generated-token prefix seen so far; returns audio
        chunks that became ready.  Call once more with lm_finished=True to
        flush the final chunk.

        fetch=False returns fused-path chunks as DEVICE arrays (np.asarray
        them later): the engine loop feeds every active session before
        fetching any audio, so one session's device->host transfer overlaps
        the other sessions' vocode compute instead of serializing on the
        per-session RPC round trip."""
        out = []
        if self.done:
            return out
        model = self.model
        if self.single_shot:
            if lm_finished:
                out.append(
                    model._token2wav(
                        np.asarray(gen_tokens, np.int32), self.prompt,
                        0, self.session, False, True, self.speed,
                    )
                )
                self.done = True
            return out
        if self.first_pending:
            need = self.this_hop + self.la
            # the catch-up boundary feed must fit the cached window; when the
            # cap is smaller than prompt+first hop (degenerate config), skip
            # the cached path entirely — finalize drains in stream chunks
            fits = self.t_fed + self.next_feed <= model.stream_max_tokens
            if len(gen_tokens) >= need and fits:
                # first emission via the one-dispatch recompute program
                # (prompt + first hop); the cached state is primed (from the
                # model's per-prompt snapshot cache when warm) and caught up
                # with one discarded boundary feed — cached == recompute is
                # equality-verified, so the mix is exact
                out.append(
                    model._token2wav(
                        np.asarray(gen_tokens[:need], np.int32), self.prompt,
                        0, self.session, True, False,
                    )
                )
                self.first_apply(gen_tokens)
            elif lm_finished:
                out.extend(self._finalize(np.asarray(gen_tokens, np.int32)))
                self.done = True
                return out
            else:
                return out
        while True:
            avail = self.P + len(gen_tokens) - self.gen_base
            if (
                self.next_feed == self.hop and self.this_hop == self.hop
                and self.mel_buf.shape[2] == 0 and self.t_fed >= self.P
                and model._fused_cache_ok(self.session)
            ):
                # steady state: one fused dispatch (flow + HiFT + crossfade +
                # cache rotation), caches stay on device.  The chunk size
                # escalates to 2 hops once the stream has a few seconds of
                # lead: the cached chunk's cost is op-count-bound (nearly
                # independent of n), so double chunks halve the per-audio-
                # second vocode cost at no TTFA expense.
                h = self._cur_hop()
                cap = model.stream_max_tokens
                if self.t_fed + h > cap and self._can_rollover(
                    gen_tokens, lm_finished
                ):
                    # window re-prime (same O(T) guarantee as the direct
                    # path's rollover): streaming stays in the cached path
                    # past the window cap instead of abandoning the rest to
                    # the finalize drain's recompute chunks
                    self._rollover(gen_tokens)
                    continue
                if not (avail >= self.t_fed + h + self.la and self.t_fed + h <= cap):
                    break  # wait for enough tokens for the full chunk
                tok = self._combined(self.t_fed, h, gen_tokens)[None]
                ctx = self._combined(self.t_fed + h, self.la, gen_tokens)[None]
                cond = np.zeros(
                    (1, h * self.ratio, model.cfg.flow.output_size),
                    np.float32,
                )  # t_fed >= P: past the prompt-feat region
                cache = self.session["hift_cache"]
                fused = model._stream_chunk_fused_fn(h)
                self.fstate, audio_d, c_mel, c_src, c_sp = fused(
                    self.sparams, self.fstate, jnp.asarray(tok),
                    jnp.asarray(ctx), jnp.asarray(self.prompt.embedding[None]),
                    jnp.asarray(cond), model.params["hift"], model._next_rng(),
                    jnp.asarray(cache["mel"]), jnp.asarray(cache["source"]),
                    jnp.asarray(cache["speech"]),
                )
                self.session["hift_cache"] = {
                    "mel": c_mel, "source": c_src, "speech": c_sp,
                }
                out.append(audio_d)  # device array; fetched below or by caller
                self.t_fed += h
                self.emitted += h
                continue
            if not (
                avail >= self.t_fed + self.next_feed + self.la
                and self.t_fed + self.next_feed <= model.stream_max_tokens
            ):
                break
            mel = self._feed(self.t_fed, self.next_feed, gen_tokens)
            start = max(0, self.prompt_mel - self.t_fed * self.ratio)
            self.mel_buf = np.concatenate([self.mel_buf, mel[:, :, start:]], axis=2)
            self.t_fed += self.next_feed
            self.next_feed = self.hop
            while self.mel_buf.shape[2] >= self.this_hop * self.ratio:
                chunk_mel = self.mel_buf[:, :, : self.this_hop * self.ratio]
                self.mel_buf = self.mel_buf[:, :, self.this_hop * self.ratio :]
                out.append(model._hift_chunk(chunk_mel, self.session, finalize=False))
                self.emitted += self.this_hop
                self.this_hop = self.hop
        if lm_finished:
            remaining = len(gen_tokens) - self.emitted
            cap_hit = self.t_fed + self.next_feed > model.stream_max_tokens
            if remaining > 0 or self.session["hift_cache"] is not None or cap_hit:
                out.extend(self._finalize(np.asarray(gen_tokens, np.int32)))
            self.done = True
        if fetch:
            fetched = []
            for c in out:
                c = np.asarray(c)
                if c.dtype == np.int16:  # fused programs pre-pack on TPU
                    c = c.astype(np.float32) / 32767.0
                fetched.append(c)
            return fetched
        return out

    # -- slot-batched steady-state hooks (TTSEngine groups sessions) --------

    def first_ready(self, gen_tokens: np.ndarray) -> bool:
        """True iff the next action is the first emission (batchable)."""
        return (
            not self.done
            and not self.single_shot
            and self.first_pending
            and len(gen_tokens) >= self.this_hop + self.la
            and self.t_fed + self.next_feed <= self.model.stream_max_tokens
        )

    def first_apply(self, gen_tokens: np.ndarray):
        """Commit the first emission: prime the cached state (per-prompt
        snapshot cache) and catch it up behind the already-emitted audio
        with one discarded boundary feed."""
        self.fstate, _ = self.model._primed_flow_state(self.prompt)
        self._feed(self.t_fed, self.next_feed, gen_tokens, materialize=False)
        self.t_fed += self.next_feed
        self.emitted = self.this_hop
        self.this_hop = self.hop
        self.next_feed = self.hop
        self.first_pending = False

    def _cur_hop(self) -> int:
        """Steady chunk size: 1 hop while the stream builds lead, then 2 and
        4 hops (cap permitting).  The cached chunk's device cost is
        op-count-bound — nearly independent of n — so bigger chunks divide
        the per-audio-second vocode cost; the listener is seconds ahead by
        the time chunks grow, so pacing is unaffected."""
        cap = self.model.stream_max_tokens
        for mult, lead_chunks in ((4, 8), (2, 4)):
            if (
                self.emitted >= lead_chunks * self.hop
                and self.t_fed + mult * self.hop <= cap
            ):
                return mult * self.hop
        return self.hop

    def wants_steady(self, gen_tokens: np.ndarray) -> bool:
        """True iff the next action is exactly one steady-state fused chunk
        (the batchable common case; mirrors the fused-path guard in feed)."""
        if (
            self.done
            or self.single_shot
            or self.first_pending
            or self.next_feed != self.hop
            or self.this_hop != self.hop
            or self.mel_buf.shape[2] != 0
            or self.t_fed < self.P
            or not self.model._fused_cache_ok(self.session)
        ):
            return False
        h = self._cur_hop()
        return (
            self.t_fed + h <= self.model.stream_max_tokens
            and self.P + len(gen_tokens) - self.gen_base
            >= self.t_fed + h + self.la
        )

    def steady_inputs(self, gen_tokens: np.ndarray):
        """(tok, ctx, cond) host rows + hift cache arrays for one chunk."""
        h = self._cur_hop()
        tok = self._combined(self.t_fed, h, gen_tokens)
        ctx = self._combined(self.t_fed + h, self.la, gen_tokens)
        cond = np.zeros(
            (h * self.ratio, self.model.cfg.flow.output_size), np.float32
        )  # t_fed >= P: past the prompt-feat region
        cache = self.session["hift_cache"]
        return tok, ctx, cond, cache["mel"], cache["source"], cache["speech"]

    def steady_apply(self, h: int, fstate, c_mel, c_src, c_sp):
        """Commit one steady chunk's state rotation (audio handled by caller)."""
        self.fstate = fstate
        self.session["hift_cache"] = {"mel": c_mel, "source": c_src, "speech": c_sp}
        self.t_fed += h
        self.emitted += h

    def _finalize(self, gen: np.ndarray) -> list:
        """Flush the tail through the reference finalize recompute, windowing
        the context so long utterances never overflow the largest flow bucket
        (same semantics as runtime/model.py _wav_from_token_gen:546-573):
        oversized remainders are vocoded in hop-sized streaming chunks over a
        [prompt ++ recent-window] context, then one window-bounded final
        chunk.  Mirrors reference unbounded streaming, cli/model.py:336-381."""
        from cosyvoice2_eu_tpu.runtime.model import FLOW_TOKEN_BUCKETS

        model = self.model
        hop, la = self.hop, self.la
        cap = FLOW_TOKEN_BUCKETS[-1]
        window = max(hop, min(model.stream_rollover_window,
                              cap - self.P - 2 * (hop + la)))
        token_offset = self.emitted
        base = 0
        out = []
        # drain an oversized remainder in streaming chunks until the final
        # recompute (prompt + window + remainder) fits the largest bucket
        while len(gen) - token_offset > max(cap - self.P - window, 0):
            this_hop = hop + self.prompt_pad if token_offset == 0 else hop
            if len(gen) - token_offset < this_hop + la:
                break  # too short for a full stream chunk; final handles it
            # re-base EVERY chunk: a constant [prompt ++ window] context
            # keeps the recompute bucket fixed (~384) instead of ratcheting
            # to 1024 before each re-base
            base = max(base, token_offset - window)
            rel = token_offset - base
            chunk = gen[base : token_offset + this_hop + la]
            out.append(
                model._token2wav(chunk, self.prompt, rel, self.session,
                                 True, False)
            )
            token_offset += this_hop
        # window-bound the final recompute unconditionally: context beyond
        # [prompt ++ window] contributes nothing audible to the last chunk
        # but quadruples its bucket (768 vs 384) — the finalize was the
        # second-largest term of engine wall time at 4 streams
        base = max(base, token_offset - window)
        over = self.P + (len(gen) - base) - cap
        if over > 0:  # prompt so long even the hop-window overflows
            base = min(token_offset, base + over)
        out.append(
            model._token2wav(gen[base:], self.prompt, token_offset - base,
                             self.session, False, True, self.speed)
        )
        return out


@dataclass
class _Request:
    prompt: PromptInputs
    out: "queue.Queue[Optional[np.ndarray]]"
    speed: float = 1.0
    slot: int = -1
    harvested: int = 0
    session: Optional[StreamSession] = None
    failed: Optional[str] = None


class RequestHandle:
    """Iterable over a request's audio chunks (blocks until each is ready).

    Chunks may arrive as DEVICE arrays (int16-packed on TPU): the engine
    loop never blocks on device->host audio transfers — each consumer
    thread fetches its own chunks, overlapping the transfer with the
    loop's next decode/vocode dispatches."""

    def __init__(self, req: _Request):
        self._req = req

    def __iter__(self):
        while True:
            chunk = self._req.out.get()
            if chunk is None:
                if self._req.failed:
                    raise RuntimeError(self._req.failed)
                return
            if not isinstance(chunk, np.ndarray):
                chunk = np.asarray(chunk)
            if chunk.dtype == np.int16:
                chunk = chunk.astype(np.float32) / 32767.0
            yield chunk


class TTSEngine:
    """Slot-batched continuous serving over one TTSModel."""

    def __init__(self, model, n_slots: int = 4, chunk_steps: int = 25,
                 max_cache: int = 1024, max_gen: int = 640):
        self.model = model
        self.cfg = model.cfg
        self.n_slots = n_slots
        self.chunk_steps = chunk_steps
        self.max_gen = min(max_gen, max_cache - 1)
        self.max_cache = max_cache
        cfgl = self.cfg.llm
        dtype = model.params["llm"]["llm_embedding"]["weight"].dtype
        self.state = llm_mod.slots_init(
            cfgl, n_slots, max_cache, self.max_gen, jax.random.key(model.seed + 17),
            dtype=dtype,
        )
        # params are ARGUMENTS, never closures: closed-over params inline as
        # HLO constants (gigabytes in the compile request -> HTTP 413 on the
        # remote compile service, minutes of lowering)
        def _decode_with_harvest(params, st):
            st = llm_mod.slots_decode(params, cfgl, st, chunk_steps)
            # the harvest is an explicit COPY into fresh buffers: the next
            # decode dispatch donates the state (including tokens), so the
            # loop can fetch harvest N while decode N+1 runs on device
            return st, (jnp.copy(st.tokens), jnp.copy(st.lengths),
                        jnp.copy(st.finished))

        # AOT-wrapped (not plain jit): a fresh engine in a fresh process loads
        # the decode executable from the store instead of paying trace+lower+
        # compile inside the first request's TTFA window
        self._decode = aot_jit(
            f"engine_decode_s{n_slots}_c{chunk_steps}"
            f"_k{max_cache}_g{self.max_gen}_{jnp.dtype(dtype).name}",
            _decode_with_harvest, donate_argnums=(1,),
        )
        # one-deep decode pipeline (VERDICT r3 next #6): harvest of chunk N
        # transfers to host while chunk N+1 executes, so engine throughput is
        # not serialized on the per-chunk device_get RPC round trip
        self._pending_harvest = None
        self._harvest_skip: set[int] = set()
        self._prefill_jit = None
        self._insert_jit = None
        from collections import deque

        self._staged: "deque" = deque()
        self._pad_state_cache = None
        self._pending: "queue.Queue[_Request]" = queue.Queue()
        self._slots: list[Optional[_Request]] = [None] * n_slots
        self._lock = threading.Lock()
        self._running = False
        self._thread: Optional[threading.Thread] = None

    # -- public ----------------------------------------------------------

    def submit(self, prompt: PromptInputs, speed: float = 1.0) -> RequestHandle:
        req = _Request(prompt=prompt, out=queue.Queue(), speed=speed)
        self._pending.put(req)
        self._ensure_running()
        return RequestHandle(req)

    def close(self):
        self._running = False
        if self._thread is not None:
            self._thread.join(timeout=30)

    # -- internals --------------------------------------------------------

    def _ensure_running(self):
        with self._lock:
            if not self._running:
                self._running = True
                self._thread = threading.Thread(target=self._loop, daemon=True)
                self._thread.start()

    @property
    def _prefill_fn(self):
        # PURE prefill (no SlotState argument): dispatched the moment a
        # request arrives, overlapping with ongoing slot decode; the result
        # merges via the tiny _insert op at a chunk boundary, so admission
        # no longer stalls live streams behind a full prompt forward pass.
        # One jit wrapper; jax re-specializes per prompt-bucket shape.
        if self._prefill_jit is None:
            dtype = self.state.kv.k.dtype
            max_cache = self.state.kv.k.shape[3]
            self._prefill_jit = aot_jit(
                f"engine_prefill_k{max_cache}_{jnp.dtype(dtype).name}",
                lambda params, ids, src, pl: llm_mod.prefill_row(
                    params, self.cfg.llm, ids, src, pl, max_cache, dtype,
                ),
            )
        return self._prefill_jit

    @property
    def _insert_fn(self):
        if self._insert_jit is None:
            self._insert_jit = aot_jit(
                "engine_insert", llm_mod.slot_insert, donate_argnums=(0,)
            )
        return self._insert_jit

    def _stage(self, req: _Request):
        """Dispatch prefill + build the flow session ahead of a free slot."""
        model = self.model
        ids, src, prompt_len, p_bucket, min_len, max_len = model._pack_lm_prompt(req.prompt)
        if p_bucket >= self.state.kv.k.shape[3]:
            raise ValueError(f"prompt bucket {p_bucket} exceeds engine cache")
        row, last = self._prefill_fn(
            model.params["llm"], jnp.asarray(ids), jnp.asarray(src),
            jnp.asarray(prompt_len, jnp.int32),
        )
        req.session = StreamSession(model, req.prompt, speed=req.speed)
        meta = (prompt_len, min_len, min(max_len, self.max_gen), p_bucket)
        self._staged.append((req, row, last, meta))

    def _insert(self, slot: int):
        req, row, last, (pl, mn, mx, pb) = self._staged.popleft()
        self.state = self._insert_fn(
            self.state, jnp.asarray(slot, jnp.int32), row, last,
            jnp.asarray(pl, jnp.int32), jnp.asarray(mn, jnp.int32),
            jnp.asarray(mx, jnp.int32), jnp.asarray(pb, jnp.int32),
        )
        req.slot = slot
        self._slots[slot] = req
        # any in-flight harvest predates this insert; its row is stale
        self._harvest_skip.add(slot)

    def _loop(self):
        try:
            while self._running:
                self._loop_once()
        except Exception as e:  # backend death: fail everyone, allow restart
            msg = f"engine loop died: {e!r}"
            self._pending_harvest = None
            self._harvest_skip.clear()
            for slot, req in enumerate(self._slots):
                if req is not None:
                    req.failed = msg
                    req.out.put(None)
                    self._slots[slot] = None
            while self._staged:
                req = self._staged.popleft()[0]
                req.failed = msg
                req.out.put(None)
            # _decode donates the state; if it died mid-call the old buffer
            # may be deleted — rebuild so a restarted loop starts clean.
            try:
                cfgl = self.cfg.llm
                dtype = self.model.params["llm"]["llm_embedding"]["weight"].dtype
                self.state = llm_mod.slots_init(
                    cfgl, self.n_slots, self.max_cache, self.max_gen,
                    jax.random.key(self.model.seed + 17), dtype=dtype,
                )
            except Exception:
                pass  # backend itself is gone; restart will surface it
            # Order matters: reset the running flag BEFORE the final pending
            # drain, both under the lock submit()'s _ensure_running takes.
            # A request enqueued before the drain is failed here; one enqueued
            # after sees _running=False and restarts the loop — no request can
            # be stranded unstarted with a dead loop.
            with self._lock:
                self._running = False
                while True:
                    try:
                        req = self._pending.get_nowait()
                    except queue.Empty:
                        break
                    req.failed = msg
                    req.out.put(None)

    def _first_batch(self, group, tokens, lengths):
        """Batched first emissions: ONE batched flow recompute + ONE batched
        HiFT for every session awaiting its first chunk (rows share a token
        bucket; per-row valid lengths cut on the host, like tts_batch).
        Sequential per-session recomputes were ~90 ms each — the dominant
        term of cold 4-stream TTFA.  Returns per-session HOST audio rows."""
        from cosyvoice2_eu_tpu.runtime.model import FLOW_TOKEN_BUCKETS

        model = self.model
        cfg = model.cfg
        ratio = cfg.flow.token_mel_ratio
        la = model.pre_lookahead_len
        up = cfg.hift.upsample_scale
        sc = model.source_cache_len
        sessions = [req.session for _, req in group]
        gens = [tokens[slot, : int(lengths[slot])] for slot, _ in group]
        needs = [s.this_hop + la for s in sessions]
        totals = [s.P + n for s, n in zip(sessions, needs)]
        if max(totals) > FLOW_TOKEN_BUCKETS[-1]:
            raise ValueError("prompt exceeds flow bucket; use per-session path")
        # pad to n_slots rows (dup row 0): one compiled program per
        # (token bucket, hift bucket) regardless of how many sessions are
        # admitted together
        b = self.n_slots
        n_real = len(group)
        tok_bucket = bucket_for(max(totals), buckets=FLOW_TOKEN_BUCKETS)
        tok_arr = np.zeros((b, tok_bucket), np.int32)
        feat = np.zeros((b, tok_bucket * ratio, cfg.flow.output_size), np.float32)
        feat_len = np.zeros((b,), np.int32)
        emb = np.stack(
            [s.prompt.embedding for s in sessions]
            + [sessions[0].prompt.embedding] * (b - n_real)
        )
        pad_totals = list(totals) + [totals[0]] * (b - n_real)
        for i, s in enumerate(sessions):
            sp = s.prompt.flow_prompt_speech_tokens.astype(np.int32)
            tok_arr[i, : s.P] = sp
            tok_arr[i, s.P : totals[i]] = gens[i][: needs[i]]
            feat[i, : s.prompt.prompt_feat.shape[0]] = s.prompt.prompt_feat
            feat_len[i] = s.prompt.prompt_feat.shape[0]
        for i in range(n_real, b):
            tok_arr[i] = tok_arr[0]
            feat[i] = feat[0]
            feat_len[i] = feat_len[0]
        flow_fn = model._flow_fn(tok_bucket, True, False)
        mel_d = flow_fn(
            model.params["flow"], jnp.asarray(tok_arr),
            jnp.asarray(pad_totals, jnp.int32), jnp.asarray(feat),
            jnp.asarray(feat_len), jnp.asarray(emb),
        )
        # fetch only each row's generated-region window, sliced device-side
        tts_mels = jax.device_get([
            mel_d[i, :, int(feat_len[i]) : (totals[i] - la) * ratio]
            for i in range(n_real)
        ])
        mel_lens = [m.shape[1] for m in tts_mels]
        h_bucket = bucket_for(
            max(mel_lens), buckets=(32, 64, 128, 256, 512, 1024, 2048)
        )
        mel_in = np.zeros((b, cfg.flow.output_size, h_bucket), np.float32)
        for i, m in enumerate(tts_mels):
            mel_in[i, :, : m.shape[1]] = m
            mel_in[i, :, m.shape[1] :] = m[:, -1:]
        for i in range(n_real, b):
            mel_in[i] = mel_in[0]
        hift_fn = model._hift_fn(h_bucket, True)
        audio_d, source_d = hift_fn(
            model.params["hift"], jnp.asarray(mel_in), model._next_rng(),
            jnp.zeros((b, 1, sc), jnp.float32), jnp.asarray(0),
        )
        # fetch audio int16-packed and only the per-row source-cache tails
        # (the full padded source buffer is megabytes over the tunnel)
        pack = model._fetch_i16
        prepared = [
            model._audio_i16(audio_d) if pack else audio_d,
        ] + [
            source_d[i : i + 1, :, mel_lens[i] * up - sc : mel_lens[i] * up]
            for i in range(n_real)
        ]
        fetched = jax.device_get(prepared)
        audio = fetched[0]
        if audio.dtype == np.int16:
            audio = audio.astype(np.float32) / 32767.0
        tails = fetched[1:]
        out = []
        for i, s in enumerate(sessions):
            n_samples = mel_lens[i] * up
            a = audio[i, :n_samples]
            s.session["hift_cache"] = {
                "mel": tts_mels[i][None, :, -model.mel_cache_len :],
                "source": tails[i],
                "speech": a[-sc:],
            }
            s.first_apply(gens[i])
            out.append(a[:-sc])
        return out

    @property
    def _pad_state(self):
        """Shared dummy FlowStreamState for padding vocode groups to
        n_slots: ONE batched program per hop, no donation (the dummy is
        aliased across pad rows and reused forever)."""
        if self._pad_state_cache is None:
            dtype = self.model.params["flow"]["input_embedding"]["weight"].dtype
            self._pad_state_cache = self.model._init_state_fn(dtype)()
        return self._pad_state_cache

    def _steady_batch(self, group, tokens, lengths):
        """One slot-batched fused chunk for `group` sessions (padded to
        n_slots rows); returns the per-session audio rows as DEVICE arrays."""
        model = self.model
        hop = group[0][1].session._cur_hop()  # group is homogeneous in hop
        rows = [
            req.session.steady_inputs(tokens[slot, : int(lengths[slot])])
            for slot, req in group
        ]
        n_pad = self.n_slots - len(group)
        pad = lambda arr: np.concatenate(
            [arr] + [arr[:1]] * n_pad, axis=0
        ) if n_pad else arr
        tok = pad(np.stack([r[0] for r in rows]))
        ctx = pad(np.stack([r[1] for r in rows]))
        cond = pad(np.stack([r[2] for r in rows]))
        emb = pad(np.stack([req.prompt.embedding for _, req in group]))
        sc, mc = model.source_cache_len, model.mel_cache_len
        c_mel = jnp.concatenate(
            [jnp.asarray(r[3]) for r in rows]
            + [jnp.zeros((n_pad, 80, mc), jnp.float32)] * (1 if n_pad else 0),
            axis=0,
        )
        c_src = jnp.concatenate(
            [jnp.asarray(r[4]) for r in rows]
            + [jnp.zeros((n_pad, 1, sc), jnp.float32)] * (1 if n_pad else 0),
            axis=0,
        )
        c_sp = jnp.concatenate(
            [jnp.stack([jnp.asarray(r[5]) for r in rows])]
            + [jnp.zeros((n_pad, sc), jnp.float32)] * (1 if n_pad else 0),
            axis=0,
        )
        states = tuple(req.session.fstate for _, req in group) + (
            (self._pad_state,) * n_pad
        )
        fused = model._stream_chunk_fused_batch_fn(hop, self.n_slots)
        states_out, audio, c_mel2, c_src2, c_sp2 = fused(
            model._get_stream_params(), states, jnp.asarray(tok),
            jnp.asarray(ctx), jnp.asarray(emb), jnp.asarray(cond),
            model.params["hift"], model._next_rng(), c_mel, c_src, c_sp,
        )
        out = []
        for i, (slot, req) in enumerate(group):
            req.session.steady_apply(
                hop, states_out[i], c_mel2[i : i + 1], c_src2[i : i + 1],
                c_sp2[i],
            )
            out.append(audio[i])
        return out

    def _loop_once(self):
        # stage pending requests (pure prefill dispatch + session build) the
        # moment they arrive — even while every slot is busy — so the device
        # overlaps prompt prefill with ongoing decode chunks
        while len(self._staged) < self.n_slots + 2:
            try:
                req = self._pending.get_nowait()
            except queue.Empty:
                break
            try:
                self._stage(req)
            except Exception:
                # transient backend failures (e.g. a remote-compile transport
                # hiccup) get one retry before surfacing; prefill is pure, so
                # retrying is always safe
                import time as _time

                _time.sleep(1.0)
                try:
                    self._stage(req)
                except Exception as e2:
                    req.failed = str(e2)
                    req.out.put(None)
        # merge staged requests into free slots (cheap row copy, no forward)
        for slot in range(self.n_slots):
            if self._slots[slot] is None and self._staged:
                self._insert(slot)
        active = [r for r in self._slots if r is not None]
        if not active:
            # all requests completed: any in-flight speculative harvest
            # belongs entirely to finished slots — drop it
            self._pending_harvest = None
            self._harvest_skip.clear()
            if self._pending.empty() and not self._staged:
                try:
                    req = self._pending.get(timeout=0.2)
                    self._pending.put(req)
                except queue.Empty:
                    return
            return

        timer = self.model.timer
        params = self.model.params["llm"]
        if self._pending_harvest is None:
            with timer.stage("eng_decode"):
                self.state, self._pending_harvest = self._decode(params, self.state)
        harvest = self._pending_harvest
        # speculative dispatch of decode N+1 while harvest N transfers and
        # the sessions vocode chunk N: the device queue stays fed instead of
        # idling a full RPC round trip per chunk.  Skipped when an admission
        # is waiting — inserts must land between decode chunks.
        if not self._staged and self._pending.empty():
            with timer.stage("eng_decode_spec"):
                self.state, self._pending_harvest = self._decode(params, self.state)
        else:
            self._pending_harvest = None
        with timer.stage("eng_harvest_fetch"):
            tokens, lengths, finished = jax.device_get(harvest)
        skip, self._harvest_skip = self._harvest_skip, set()
        active_rows = [
            (slot, req) for slot, req in enumerate(self._slots)
            if req is not None and slot not in skip
        ]
        # slot-batched steady-state rounds: every session whose next action
        # is exactly one fused chunk advances in a SINGLE batched dispatch
        # (vmapped flow feeds + one batched HiFT) — n sessions vocode for
        # ~the price of one instead of n sequential 85 ms dispatches
        batched: dict = {slot: [] for slot, _ in active_rows}
        firsts = [
            (slot, req) for slot, req in active_rows
            if req.failed is None
            and req.session.first_ready(tokens[slot, : int(lengths[slot])])
        ]
        if len(firsts) >= 2:
            try:
                with timer.stage("eng_first_batch"):
                    rows = self._first_batch(firsts, tokens, lengths)
                for (slot, _), audio in zip(firsts, rows):
                    batched[slot].append(audio)
            except ValueError:
                pass  # oversized prompt row: per-session feed handles it
            except Exception as e:
                for _, req in firsts:
                    req.failed = str(e)
        while True:
            ready = [
                (slot, req) for slot, req in active_rows
                if req.failed is None
                and req.session.wants_steady(tokens[slot, : int(lengths[slot])])
            ]
            # group by current chunk size (sessions escalate to double
            # chunks at different times)
            by_hop: dict = {}
            for slot, req in ready:
                by_hop.setdefault(req.session._cur_hop(), []).append((slot, req))
            group = next((g for g in by_hop.values() if len(g) >= 2), None)
            if group is None:  # singles keep the existing fused program
                break
            try:
                with timer.stage("eng_steady_batch"):
                    rows = self._steady_batch(group, tokens, lengths)
            except Exception as e:
                for _, req in group:
                    req.failed = str(e)
                break
            for (slot, _), audio_d in zip(group, rows):
                batched[slot].append(audio_d)
        # two passes: feed (dispatch vocode) for EVERY active session first,
        # then fetch+enqueue the audio — session A's device->host transfer
        # overlaps session B's vocode compute (fetch=False defers np.asarray)
        results = []
        for slot, req in active_rows:
            n = int(lengths[slot])
            done = bool(finished[slot]) or req.failed is not None
            chunks: list = batched[slot]
            if req.failed is None and (n > req.harvested or done):
                req.harvested = n
                try:
                    with timer.stage("eng_feed"):
                        chunks = chunks + req.session.feed(
                            tokens[slot, :n], done, fetch=False
                        )
                except Exception as e:
                    req.failed = str(e)
                    done = True
            results.append((slot, req, chunks, done))
        # one batched transfer for every chunk produced this iteration (a
        # single host sync instead of one RPC round trip per session chunk)
        # enqueue WITHOUT fetching: device chunks are int16-packed (half the
        # tunnel bytes) and each consumer thread fetches its own audio, so
        # the loop thread never blocks on a device->host transfer — the
        # transfer overlaps the next iteration's decode/vocode dispatches
        with timer.stage("eng_enqueue"):
            model = self.model
            pack = model._fetch_i16
            for slot, req, chunks, done in results:
                for c in chunks:
                    if (
                        pack and not isinstance(c, np.ndarray)
                        and c.dtype != jnp.int16  # fused programs pre-pack
                    ):
                        c = model._audio_i16(c)
                    req.out.put(c)
                if done:
                    req.out.put(None)
                    self._slots[slot] = None
                    self.state = self.state._replace(
                        active=self.state.active.at[slot].set(False)
                    )


class EngineAPI:
    """Cosy2EU-compatible facade that serves through the batching engine.

    Drop-in for the servers: same tts/stream surface, but concurrent
    requests share the slot-batched LM decode instead of queueing behind a
    single session (serving/http_server.py --engine-slots).
    """

    def __init__(self, api, n_slots: int = 4, **engine_kwargs):
        self._api = api
        self._frontend = api._frontend
        self._model = api._model  # direct-path fallback for non-engine routes
        self.sample_rate = api.sample_rate
        self.engine = TTSEngine(api._model, n_slots=n_slots, **engine_kwargs)

    def _prepare(self, prompt, prompt_text: str = "", **precomputed):
        return self._api._prepare(prompt, prompt_text, **precomputed)

    def _inputs(self, text, prompt, prompt_text, mode, instruct_text, **precomputed):
        art = self._api._prepare(prompt, prompt_text, **precomputed)
        fe = self._frontend
        if mode == "instruct2":
            return fe.frontend_instruct2(text, instruct_text, art)
        build = {
            "zero_shot": fe.frontend_zero_shot,
            "cross_lingual": fe.frontend_cross_lingual,
        }[mode]
        return build(text, art)

    def stream(self, text, prompt, *, prompt_text: str = "", speed: float = 1.0,
               text_frontend: bool = False, mode: str = "cross_lingual",
               instruct_text: str = "", **precomputed):
        segments = (
            self._frontend.normalize_text(text, split=True) if text_frontend else [text]
        )
        for seg in segments:
            inputs = self._inputs(seg, prompt, prompt_text, mode, instruct_text,
                                  **precomputed)
            for chunk in self.engine.submit(inputs, speed=speed):
                yield chunk[None]

    def tts(self, text, prompt, **kw):
        chunks = [c[0] for c in self.stream(text, prompt, **kw)]
        return np.concatenate(chunks)[None], self.sample_rate

    def add_zero_shot_spk(self, prompt_text, prompt, spk_id):
        return self._api.add_zero_shot_spk(prompt_text, prompt, spk_id)

    def close(self):
        self.engine.close()
