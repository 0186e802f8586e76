"""Per-stage TPU timing: LM prefill / LM decode / flow / hift."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cosyvoice2_eu_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import cosyvoice2_eu_tpu as cosy
from cosyvoice2_eu_tpu.models import llm as llm_mod
from cosyvoice2_eu_tpu.models.flow import flow_inference
from cosyvoice2_eu_tpu.models.hift import hift_inference


def _force(out):
    """axon executes lazily; a host fetch forces completion."""
    import numpy as _np

    leaf = jax.tree.leaves(out)[0]
    _np.asarray(jax.device_get(leaf)).ravel()[:1]
    return out


def t(fn, *args, n=3, **kw):
    out = _force(fn(*args, **kw))
    t0 = time.time()
    for _ in range(n):
        out = _force(fn(*args, **kw))
    return (time.time() - t0) / n, out


def main():
    cfg = cosy.TTSConfig()
    api = cosy.load(model_dir=None, config=cfg, seed=0)
    params = api._model.params
    rng = np.random.default_rng(0)

    P, GEN = 256, 640
    ids = jnp.asarray(rng.integers(0, 1000, (1, P)), jnp.int32)
    src = jnp.asarray(rng.integers(0, 3, (1, P)), jnp.int32)
    plen = jnp.asarray([197])

    prefill = jax.jit(lambda pp, i, s, pl, r: llm_mod.lm_prefill(pp, cfg.llm, i, s, pl, r, GEN))
    dt, state = t(prefill, params["llm"], ids, src, plen, jax.random.key(0))
    print(f"lm_prefill({P}): {dt*1e3:.1f} ms")

    chunk = jax.jit(lambda pp, st, pl, mn, mx, tgt: llm_mod.lm_decode_chunk(
        pp, cfg.llm, st, pl, mn, mx, P, tgt))
    dt, state2 = t(chunk, params["llm"], state, plen, jnp.asarray([600]), jnp.asarray([600]), jnp.asarray(100), n=1)
    print(f"lm_decode 100 steps: {dt*1e3:.1f} ms -> {dt*10:.2f} ms/token")
    dt, state3 = t(chunk, params["llm"], state2, plen, jnp.asarray([600]), jnp.asarray([600]), jnp.asarray(200), n=1)
    print(f"lm_decode next 100 steps: {dt*1e3:.1f} ms")

    # flow at production-ish bucket
    TOK = 1024
    tok = jnp.asarray(rng.integers(0, 6561, (1, TOK)), jnp.int32)
    feat = jnp.asarray(rng.standard_normal((1, TOK * 2, 80)), jnp.float32)
    emb = jnp.asarray(rng.standard_normal((1, 192)), jnp.float32)
    flow_fn = jax.jit(lambda pp, *a: flow_inference(pp, cfg.flow, *a))
    dt, mel = t(flow_fn, params["flow"], tok, jnp.asarray([750]), feat, jnp.asarray([300]), emb, n=2)
    print(f"flow_inference(tok_bucket={TOK}, mel={TOK*2}): {dt*1e3:.1f} ms")

    TOKS = 128
    tok_s = tok[:, :TOKS]
    flow_s = jax.jit(lambda pp, *a: flow_inference(pp, cfg.flow, *a))
    dt, _ = t(flow_s, params["flow"], tok_s, jnp.asarray([120]), feat[:, : TOKS * 2], jnp.asarray([100]), emb, n=2)
    print(f"flow_inference(tok_bucket={TOKS}): {dt*1e3:.1f} ms")

    MEL = 2048
    mel_in = jnp.asarray(rng.standard_normal((1, 80, MEL)), jnp.float32)
    hift_fn = jax.jit(lambda pp, m, r: hift_inference(pp, cfg.hift, m, r))
    dt, _ = t(hift_fn, params["hift"], mel_in, jax.random.key(1), n=2)
    print(f"hift({MEL} mel -> {MEL*480/1e3:.0f}k samples): {dt*1e3:.1f} ms")

    MEL = 256
    mel_in = jnp.asarray(rng.standard_normal((1, 80, MEL)), jnp.float32)
    hift_fn2 = jax.jit(lambda pp, m, r: hift_inference(pp, cfg.hift, m, r))
    dt, _ = t(hift_fn2, params["hift"], mel_in, jax.random.key(1), n=2)
    print(f"hift({MEL} mel): {dt*1e3:.1f} ms")


if __name__ == "__main__":
    main()
