"""Precompile the serving program set into a shippable AOT store.

The AOT executable store (runtime/aot_cache.py) makes the SECOND process on
a machine fast; this module makes the FIRST one fast too: run it once at
model-packaging time and ship ``<model_dir>/aot_store`` with the weights —
``load()`` picks the store up automatically, so a fresh machine's first
audio needs no tracing/lowering/compiling at all.  This is the role the
reference's prebuilt TensorRT/TorchScript artifacts play
(reference: cli/model.py:100-116, 285-287).

    cosy2-eu warmup --model-dir ~/.cache/cosyvoice2-eu          # into model dir
    cosy2-eu warmup --export-store /path/store [--batch 20]

Programs covered: LM prefill/decode + flow + HiFT at every prompt bucket the
standard modes hit, the streaming chunk set (cold first-chunk recompute,
primed warm path, fused first emission), and optionally tts_batch.
"""

from __future__ import annotations

import logging
import time

import numpy as np

logger = logging.getLogger(__name__)


def _prompt(cfg, rng: np.random.Generator, n_sp: int):
    # the SAME recipe bench.py measures with (utils/synthetic.py), so the
    # store precompiles exactly the programs production/bench will request
    from cosyvoice2_eu_tpu.utils.synthetic import synthetic_prompt

    return synthetic_prompt(cfg, rng, n_sp)


def warmup_programs(model, prompt_seconds=(3, 6, 10), batch: int = 0) -> dict:
    """Drive the standard program set through one TTSModel; every program
    compiled lands in the active AOT store (aot_cache.cache_dir())."""
    cfg = model.cfg
    rng = np.random.default_rng(0)
    t0 = time.time()
    n_programs = 0
    for secs in prompt_seconds:
        n_sp = int(secs * cfg.flow.input_frame_rate)
        p = _prompt(cfg, rng, n_sp)
        for _ in model.tts(p, stream=False):
            pass
        # twice: cold (recompute-first-chunk) then warm (fused first emission)
        for _ in model.tts(p, stream=True):
            pass
        for _ in model.tts(p, stream=True):
            pass
        n_programs += 3
        logger.info("warmup: prompt %ds done (%.0fs elapsed)", secs, time.time() - t0)
    if batch:
        prompts = [_prompt(cfg, np.random.default_rng(10 + i),
                           int(6 * cfg.flow.input_frame_rate))
                   for i in range(batch)]
        model.tts_batch(prompts)
        n_programs += 1
    return {"modes": n_programs, "seconds": round(time.time() - t0, 1)}


def warmup_engine(model, n_slots: int = 4) -> dict:
    """Compile the serving engine's slot-batched program set (decode /
    prefill / insert, batched first emission, batched steady chunks at every
    escalated hop) by running n_slots concurrent requests twice."""
    import threading

    from cosyvoice2_eu_tpu.serving.engine import TTSEngine

    t0 = time.time()
    cfg = model.cfg
    engine = TTSEngine(model, n_slots=n_slots)
    try:
        for round_ in range(2):  # second run reaches the escalated hops warm
            prompts = [
                _prompt(cfg, np.random.default_rng(100 + i),
                        int(6 * cfg.flow.input_frame_rate))
                for i in range(n_slots)
            ]
            handles = [engine.submit(p) for p in prompts]
            threads = [
                threading.Thread(target=lambda h=h: list(h)) for h in handles
            ]
            for th in threads:
                th.start()
            for th in threads:
                th.join()
    finally:
        engine.close()
    return {"engine_seconds": round(time.time() - t0, 1)}


def warmup_main(argv=None):
    import argparse
    import os

    p = argparse.ArgumentParser(
        prog="cosy2-eu warmup",
        description="Precompile + export the AOT executable store",
    )
    p.add_argument("--model-dir", default=None)
    p.add_argument("--export-store", default=None,
                   help="store dir (default <model_dir>/aot_store)")
    p.add_argument("--backbone", default=None)
    p.add_argument("--batch", type=int, default=0,
                   help="also compile tts_batch at this size")
    p.add_argument("--engine-slots", type=int, default=0,
                   help="also compile the serving engine's slot-batched "
                        "program set for this many slots")
    p.add_argument("--prompt-seconds", default="3,6,10")
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    from cosyvoice2_eu_tpu.runtime import aot_cache

    store = args.export_store or (
        os.path.join(args.model_dir, "aot_store") if args.model_dir else None
    )
    if store and not os.environ.get("COSY_AOT_CACHE"):
        aot_cache.set_cache_dir(store)

    import cosyvoice2_eu_tpu as cosy

    if args.model_dir:
        api = cosy.load(model_dir=args.model_dir, backbone=args.backbone)
    else:
        # shape-only store: programs depend on config shapes, not weights
        api = cosy.load(config=cosy.TTSConfig(), backbone=args.backbone, seed=0)
    secs = tuple(int(s) for s in args.prompt_seconds.split(","))
    stats = warmup_programs(api._model, prompt_seconds=secs, batch=args.batch)
    if args.engine_slots:
        stats.update(warmup_engine(api._model, n_slots=args.engine_slots))
    d = aot_cache.cache_dir()
    n_files = len([f for f in os.listdir(d) if f.endswith(".aot")]) \
        if d and os.path.isdir(d) else 0
    print({"store": d, "aot_entries": n_files, **stats})
    return 0
