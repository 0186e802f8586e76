"""Training: sequence packing, losses, and sharded train steps on an 8-CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cosyvoice2_eu_tpu.config import TrainConfig, tiny_test_config
from cosyvoice2_eu_tpu.models.flow import init_flow
from cosyvoice2_eu_tpu.models.llm import init_lm
from cosyvoice2_eu_tpu.parallel.mesh import make_mesh, replicate, shard_batch, shard_params
from cosyvoice2_eu_tpu.parallel.train_step import (
    init_train_state,
    make_flow_train_step,
    make_lm_train_step,
)
from cosyvoice2_eu_tpu.train.losses import label_smoothing_ce
from cosyvoice2_eu_tpu.train.optim import make_optimizer
from cosyvoice2_eu_tpu.train.sequences import IGNORE_ID, build_bistream, build_lm_batch, build_unistream

CFG = tiny_test_config()
TRAIN = TrainConfig(lr=1e-4, accum_grad=1)


def test_unistream_layout():
    cfg = CFG.llm
    text = np.asarray([5, 6, 7], np.int32)
    speech = np.asarray([10, 11, 12, 13], np.int32)
    ids, src, target = build_unistream(text, speech, cfg)
    assert len(ids) == len(src) == len(target) == 3 + 4 + 2
    assert ids[0] == cfg.sos_eos and ids[4] == cfg.task_id
    # task position predicts the first speech token; last predicts eos
    assert target[4] == 10 and target[-1] == cfg.eos_token
    assert (target[:4] == IGNORE_ID).all()


def test_bistream_layout():
    cfg = CFG.llm  # mix_ratio (5, 15)
    text = np.arange(2, 9, dtype=np.int32)  # 7 text tokens -> 1 full + partial
    speech = np.arange(30, dtype=np.int32) + 1  # 30 speech tokens (ratio > 3)
    ids, src, target = build_bistream(text, speech, cfg)
    assert len(ids) == len(src) == len(target)
    fill = cfg.speech_token_size + 2
    # first full chunk: 4 ignores then 15 speech targets then fill
    assert (target[1:5] == IGNORE_ID).all()
    assert target[5:20].tolist() == list(range(1, 16))
    assert target[20] == fill
    assert target[-1] == cfg.eos_token


def test_label_smoothing_ce_matches_torch():
    import torch

    rng = np.random.default_rng(0)
    logits = rng.standard_normal((2, 6, 11)).astype(np.float32)
    target = rng.integers(0, 11, (2, 6)).astype(np.int64)
    target[0, 4:] = -1  # padding
    loss, acc = label_smoothing_ce(jnp.asarray(logits), jnp.asarray(target), smoothing=0.0)
    lt = torch.nn.functional.cross_entropy(
        torch.from_numpy(logits).view(-1, 11),
        torch.from_numpy(target).view(-1),
        ignore_index=-1,
    )
    np.testing.assert_allclose(float(loss), float(lt), rtol=1e-5)


@pytest.mark.parametrize("fsdp", [1, 2])
def test_lm_train_step_sharded(fsdp):
    assert len(jax.devices()) == 8
    mesh = make_mesh(dp=8 // fsdp, fsdp=fsdp)
    cfg = CFG.llm
    params = init_lm(jax.random.key(0), cfg)
    tx = make_optimizer(TRAIN)

    rng = np.random.default_rng(1)
    texts = [rng.integers(2, 100, 6).astype(np.int32) for _ in range(8)]
    speeches = [rng.integers(0, cfg.speech_token_size, 20).astype(np.int32) for _ in range(8)]
    batch = build_lm_batch(texts, speeches, cfg, rng, bistream_prob=0.5, pad_to=64)

    with mesh:
        params = shard_params(params, mesh)
        # snapshot before the step: the train step donates its input state
        w_before = np.asarray(jax.device_get(params["llm_decoder"]["weight"]))
        state = init_train_state(params, tx)
        batch = shard_batch({k: jnp.asarray(v) for k, v in batch.items()}, mesh)
        step_fn = make_lm_train_step(cfg, TRAIN, tx)
        state2, metrics = step_fn(state, batch)

    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["acc"]) >= 0
    # params actually moved
    w_after = np.asarray(jax.device_get(state2.params["llm_decoder"]["weight"]))
    assert not np.allclose(w_after, w_before)


@pytest.mark.slow
def test_resume_continues_exact_trajectory(tmp_path):
    """3 steps -> full checkpoint -> resume == 6 uninterrupted steps.

    Pins the round-2 resume semantics (reference bin/train.py:420-473):
    optimizer moments AND the LR schedule's internal count must survive a
    checkpoint/restore, so the loss trajectory after resume is identical to
    an uninterrupted run.  warmuplr makes the LR step-dependent, so a resume
    that reset the schedule count would diverge from step 4 on.
    """
    from cosyvoice2_eu_tpu.train.executor import (
        latest_checkpoint,
        restore_train_state,
        save_checkpoint,
    )

    mesh = make_mesh(dp=8, fsdp=1)
    cfg = CFG.llm
    train_cfg = TrainConfig(lr=1e-3, scheduler="warmuplr", warmup_steps=10, accum_grad=1)
    tx = make_optimizer(train_cfg)
    step_fn = make_lm_train_step(cfg, train_cfg, tx)

    rng = np.random.default_rng(7)
    batches = []
    for _ in range(6):
        texts = [rng.integers(2, 100, 6).astype(np.int32) for _ in range(8)]
        speeches = [
            rng.integers(0, cfg.speech_token_size, 20).astype(np.int32) for _ in range(8)
        ]
        batches.append(build_lm_batch(texts, speeches, cfg, rng, pad_to=64))

    def run(state, bs):
        losses = []
        for b in bs:
            sb = shard_batch({k: jnp.asarray(v) for k, v in b.items()}, mesh)
            state, m = step_fn(state, sb)
            losses.append(float(m["loss"]))
        return state, losses

    with mesh:
        # uninterrupted 6-step run
        params = shard_params(init_lm(jax.random.key(0), cfg), mesh)
        _, losses_all = run(init_train_state(params, tx), batches)

        # 3 steps, checkpoint with optimizer state
        params = shard_params(init_lm(jax.random.key(0), cfg), mesh)
        state_a, losses_a = run(init_train_state(params, tx), batches[:3])
        save_checkpoint(
            str(tmp_path), "epoch_0_step_3", state_a.params,
            {"epoch": 0, "step": 3}, opt_state=state_a.opt_state,
        )

        # fresh-process resume: different init key proves restore really loads
        params_b = shard_params(init_lm(jax.random.key(99), cfg), mesh)
        state_b = init_train_state(params_b, tx)
        info = latest_checkpoint(str(tmp_path))
        assert info is not None and info["has_opt"]
        state_b = restore_train_state(str(tmp_path), info, state_b)
        assert int(state_b.step) == 3
        _, losses_b = run(state_b, batches[3:])

    np.testing.assert_allclose(losses_a + losses_b, losses_all, rtol=1e-6)


@pytest.mark.slow
def test_flow_train_step():
    mesh = make_mesh(dp=8, fsdp=1)
    cfg = CFG.flow
    params = init_flow(jax.random.key(0), cfg)
    tx = make_optimizer(TRAIN)
    rng = np.random.default_rng(2)
    B, T_tok = 8, 12
    batch = {
        "speech_token": jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T_tok)), jnp.int32),
        "speech_token_len": jnp.full((B,), T_tok, jnp.int32),
        "speech_feat": jnp.asarray(
            rng.standard_normal((B, T_tok * 2, cfg.output_size)), jnp.float32
        ),
        "speech_feat_len": jnp.full((B,), T_tok * 2, jnp.int32),
        "embedding": jnp.asarray(rng.standard_normal((B, cfg.spk_embed_dim)), jnp.float32),
    }
    with mesh:
        params = shard_params(params, mesh)
        state = init_train_state(params, tx)
        batch = shard_batch(batch, mesh)
        step_fn = make_flow_train_step(cfg, TRAIN, tx)
        state2, metrics = step_fn(state, batch, jax.random.key(3), streaming=False)
        state3, metrics2 = step_fn(state2, batch, jax.random.key(4), streaming=True)
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics2["loss"]))


def test_flow_train_grad_never_touches_pallas(monkeypatch):
    """Differentiating pallas_call raises NotImplementedError, so the train
    path must pin backend="xla" even when the flash kernel is globally on
    (BENCH r4 regression: flow train step died on TPU with
    NotImplementedError once T=384 started fitting the kernel).  Forcing
    COSY_TPU_FLASH=1 on CPU reproduces: the step only succeeds if training
    never reaches the pallas path."""
    monkeypatch.setenv("COSY_TPU_FLASH", "1")
    from cosyvoice2_eu_tpu.parallel.train_step import flow_loss_fn

    cfg = CFG.flow
    params = init_flow(jax.random.key(0), cfg)
    rng = np.random.default_rng(5)
    B, T_tok = 2, 12
    batch = {
        "speech_token": jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T_tok)), jnp.int32),
        "speech_token_len": jnp.full((B,), T_tok, jnp.int32),
        "speech_feat": jnp.asarray(
            rng.standard_normal((B, T_tok * 2, cfg.output_size)), jnp.float32
        ),
        "speech_feat_len": jnp.full((B,), T_tok * 2, jnp.int32),
        "embedding": jnp.asarray(rng.standard_normal((B, cfg.spk_embed_dim)), jnp.float32),
    }
    (loss, _), grads = jax.value_and_grad(
        lambda p: flow_loss_fn(p, cfg, batch, jax.random.key(6), False),
        has_aux=True,
    )(params)
    assert np.isfinite(float(loss))
    gnorm = float(sum(jnp.sum(g * g) for g in jax.tree.leaves(grads)) ** 0.5)
    assert np.isfinite(gnorm) and gnorm > 0


@pytest.mark.slow
def test_train_cli_end_to_end(tmp_path):
    """Drive the real CLI (train.main) for llm / --lora / --dpo on synthetic
    parquet with the tiny config: batches pad to the dp mesh, checkpoints
    appear, and every mode finishes an epoch."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from cosyvoice2_eu_tpu.config import config_to_dict, tiny_test_config
    from cosyvoice2_eu_tpu.train import train as T

    rng = np.random.default_rng(0)
    rows = {
        "utt": [], "spk": [], "text": [], "speech": [], "sample_rate": [],
        "speech_token": [], "reject_speech_token": [],
        "utt_embedding": [], "spk_embedding": [],
    }
    for i in range(6):  # 6 rows: exercises pad_batch_rows (6 -> 8)
        n = int(rng.integers(24000, 48000))
        rows["utt"].append(f"utt{i}")
        rows["spk"].append(f"spk{i % 2}")
        rows["text"].append("bonjour le monde")
        rows["speech"].append((rng.standard_normal(n) * 0.1).astype(np.float32).tolist())
        rows["sample_rate"].append(24000)
        rows["speech_token"].append(rng.integers(0, 81, n // 960).astype(np.int32).tolist())
        rows["reject_speech_token"].append(
            rng.integers(0, 81, n // 960).astype(np.int32).tolist()
        )
        rows["utt_embedding"].append(rng.standard_normal(192).astype(np.float32).tolist())
        rows["spk_embedding"].append(rng.standard_normal(192).astype(np.float32).tolist())
    shard = tmp_path / "shard_0.parquet"
    pq.write_table(pa.table(rows), str(shard))
    lst = tmp_path / "data.list"
    lst.write_text(str(shard) + "\n")

    import json

    cfg_path = tmp_path / "tiny.json"
    cfg_path.write_text(json.dumps(config_to_dict(tiny_test_config())))

    common = [
        "--model", "llm", "--train_data", str(lst), "--cv_data", str(lst),
        "--config", str(cfg_path), "--max_epoch", "1", "--max_frames_in_batch",
        "100000", "--seed", "3",
    ]
    for extra, tag in ([], "plain"), (["--lora"], "lora"), (["--dpo"], "dpo"):
        model_dir = tmp_path / f"exp_{tag}"
        T.main(common + ["--model_dir", str(model_dir)] + extra)
        import os as _os

        ckpts = [f for f in _os.listdir(model_dir) if f.endswith(".json")]
        assert ckpts, f"no checkpoint written for {tag}"


def test_join_uneven_inputs_breaks_together():
    """When any host runs dry, every host stops at the same step (the
    reference's cosyvoice_join semantics without the timeout hazard)."""
    from cosyvoice2_eu_tpu.parallel.distributed import join_uneven_inputs

    # simulate: this host has 5 batches, a peer has only 3
    peer_remaining = {"n": 3}

    def agree(mine):
        peer = peer_remaining["n"] > 0
        peer_remaining["n"] -= 1
        return mine and peer

    got = list(join_uneven_inputs(iter(range(5)), agree_fn=agree, tag="t"))
    assert got == [0, 1, 2]  # stopped when the peer ran out

    # symmetric: this host dry first -> generator ends immediately
    got = list(join_uneven_inputs(iter([]), agree_fn=lambda m: m, tag="t"))
    assert got == []


def test_straggler_guard_detects_stall(caplog):
    import logging as _logging
    import time

    from cosyvoice2_eu_tpu.parallel.distributed import StragglerGuard

    with caplog.at_level(_logging.ERROR):
        with StragglerGuard(timeout_s=0.3, tag="unit",
                            first_beat_grace_s=0.1) as g:
            g.beat(1)
            time.sleep(1.2)  # no further beats -> watchdog fires
    assert any("NO step progress" in r.message for r in caplog.records)


def test_straggler_guard_quiet_when_beating():
    import logging as _logging
    import time

    from cosyvoice2_eu_tpu.parallel.distributed import StragglerGuard

    records = []
    handler = _logging.Handler()
    handler.emit = lambda r: records.append(r)
    _logging.getLogger().addHandler(handler)
    try:
        with StragglerGuard(timeout_s=0.6, tag="unit2",
                            first_beat_grace_s=0.1) as g:
            for i in range(6):
                g.beat(i)
                time.sleep(0.1)
    finally:
        _logging.getLogger().removeHandler(handler)
    assert not any("NO step progress" in r.getMessage() for r in records)


# ---------------------------------------------------------------------------
# NeMo annealing scheduler family parity vs the reference torch classes
# ---------------------------------------------------------------------------

def test_annealing_schedules_match_reference():
    """Step the reference's actual torch schedulers (utils/scheduler.py) and
    pin our jax schedules to the exact LR trajectories."""
    from cosyvoice2_eu_tpu.runtime import refverify as rv

    if not rv.reference_available():
        pytest.skip("reference checkout not present")
    rv.install_reference()
    import torch
    import warnings
    from cosyvoice.utils import scheduler as ref_sched

    from cosyvoice2_eu_tpu.train import optim

    lr, warm, max_steps = 2e-3, 5, 40

    def trajectory(ref_cls, ours, steps=46, **kw):
        p = torch.nn.Parameter(torch.zeros(1))
        opt = torch.optim.SGD([p], lr=lr)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            s = ref_cls(opt, **kw)
            got, want = [], []
            for step in range(steps):
                # torch convention: last_epoch == step index at read time
                s.last_epoch = step
                want.append(s.get_lr()[0])
                got.append(float(ours(step)))
        # our schedules evaluate in float32 (they live inside jitted optax
        # transforms); the torch reference computes in float64
        np.testing.assert_allclose(got, want, rtol=3e-5, atol=1e-12)

    trajectory(
        ref_sched.NoamAnnealing,
        optim.noam_annealing(lr, 64, warm, min_lr=1e-5),
        d_model=64, warmup_steps=warm, min_lr=1e-5,
    )
    trajectory(
        ref_sched.CosineAnnealing,
        optim.cosine_annealing(lr, max_steps, warm, min_lr=1e-5),
        max_steps=max_steps, warmup_steps=warm, min_lr=1e-5,
    )
    trajectory(
        ref_sched.CosineAnnealing,
        optim.cosine_annealing(lr, max_steps, warm, constant_steps=8,
                               min_lr=1e-5),
        max_steps=max_steps, warmup_steps=warm, constant_steps=8, min_lr=1e-5,
    )
    trajectory(
        ref_sched.SquareAnnealing,
        optim.square_annealing(lr, max_steps, warm),
        max_steps=max_steps, warmup_steps=warm,
    )
    trajectory(
        ref_sched.SquareRootAnnealing,
        optim.squareroot_annealing(lr, max_steps, warm),
        max_steps=max_steps, warmup_steps=warm,
    )
    trajectory(
        ref_sched.SquareRootConstantPolicy,
        optim.squareroot_constant(lr, max_steps, 10),
        max_steps=max_steps, constant_steps=10,
    )


def test_make_schedule_annealing_names():
    from cosyvoice2_eu_tpu.train.optim import make_schedule

    for name in ("noamannealing", "cosineannealing", "squareannealing",
                 "squarerootannealing", "squarerootconstant"):
        cfg = TrainConfig(lr=1e-3, scheduler=name, warmup_steps=4,
                          max_steps=100, constant_steps=5, min_lr=1e-6)
        s = make_schedule(cfg)
        vals = [float(s(t)) for t in (0, 4, 50, 100, 120)]
        assert all(np.isfinite(v) and v >= 0 for v in vals), (name, vals)


def test_gan_steps_run_and_update():
    """Discriminator + generator alternation (train_gan.make_gan_steps):
    both steps run on a tiny batch, losses are finite, params update."""
    import optax

    from cosyvoice2_eu_tpu.models.hift import init_hift
    from cosyvoice2_eu_tpu.train.gan import init_discriminator
    from cosyvoice2_eu_tpu.train.train_gan import make_gan_steps

    cfg = tiny_test_config()
    rng = np.random.default_rng(0)
    Bg, Sg = 2, cfg.mel.hop_size * 8
    Tg = Sg // cfg.mel.hop_size
    batch = {
        "speech": jnp.asarray(rng.standard_normal((Bg, Sg)) * 0.1, jnp.float32),
        "speech_feat": jnp.asarray(
            rng.standard_normal((Bg, Tg, cfg.hift.in_channels)), jnp.float32),
        "pitch_feat": jnp.asarray(
            np.abs(rng.standard_normal((Bg, Tg))) * 200, jnp.float32),
    }
    tx = optax.adam(2e-4)
    gen = init_hift(jax.random.key(0), cfg.hift)
    disc = init_discriminator(jax.random.key(1))
    opt_g, opt_d = tx.init(gen), tx.init(disc)
    gen_step, disc_step = make_gan_steps(cfg, tx, tx)
    key = jax.random.key(2)
    gen_before = jax.tree.map(np.asarray, gen)  # steps donate their params
    disc2, opt_d, dm = disc_step(disc, opt_d, gen, batch, key)
    gen2, opt_g, gm = gen_step(gen, opt_g, disc2, batch, key)
    assert np.isfinite(float(dm["loss"])) and np.isfinite(float(gm["loss"]))
    # something actually moved
    moved = any(
        not np.allclose(np.asarray(a), b)
        for a, b in zip(jax.tree.leaves(gen2), jax.tree.leaves(gen_before))
    )
    assert moved
