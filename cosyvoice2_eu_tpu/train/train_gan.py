"""HiFT GAN training loop (generator/discriminator alternation).

Mirrors the reference GAN executor (reference:
cosy_repo/cosyvoice/utils/executor.py:88-144 train_one_epoc_gan: discriminator
turn first, then generator turn per batch; separate Adam optimizers at 2e-4,
accum_grad must be 1) on the TPU mesh.
"""

from __future__ import annotations

import argparse
import functools
import logging
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cosyvoice2_eu_tpu.config import TrainConfig, TTSConfig
from cosyvoice2_eu_tpu.parallel.mesh import make_mesh, shard_batch, shard_params
from cosyvoice2_eu_tpu.train import dataset as ds
from cosyvoice2_eu_tpu.train.executor import save_checkpoint
from cosyvoice2_eu_tpu.train.gan import (
    discriminator_step_loss,
    generator_step_loss,
    init_discriminator,
)


def make_gan_steps(cfg: TTSConfig, tx_g, tx_d):
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def gen_step(gen_params, opt_g, disc_params, batch, rng):
        (loss, metrics), grads = jax.value_and_grad(
            lambda p: generator_step_loss(p, disc_params, cfg.hift, cfg.mel, batch, rng),
            has_aux=True,
        )(gen_params)
        updates, opt_g = tx_g.update(grads, opt_g, gen_params)
        gen_params = optax.apply_updates(gen_params, updates)
        return gen_params, opt_g, metrics

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def disc_step(disc_params, opt_d, gen_params, batch, rng):
        (loss, metrics), grads = jax.value_and_grad(
            lambda p: discriminator_step_loss(p, gen_params, cfg.hift, batch, rng),
            has_aux=True,
        )(disc_params)
        updates, opt_d = tx_d.update(grads, opt_d, disc_params)
        disc_params = optax.apply_updates(disc_params, updates)
        return disc_params, opt_d, metrics

    return gen_step, disc_step


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--train_data", required=True)
    parser.add_argument("--cv_data", required=False)
    parser.add_argument("--model_dir", required=True)
    parser.add_argument("--qwen_pretrain_path", default="")
    parser.add_argument("--max_epoch", type=int, default=20)
    parser.add_argument("--seed", type=int, default=1986)
    parser.add_argument("--log_interval", type=int, default=100)
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    cfg = TTSConfig()
    train_cfg = TrainConfig(optim="adam", lr=2e-4, accum_grad=1, grad_clip=5.0)
    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(2e-4))

    from cosyvoice2_eu_tpu.frontend.tokenizer import get_tokenizer
    from cosyvoice2_eu_tpu.models.hift import init_hift
    from cosyvoice2_eu_tpu.ops.mel import mel_spectrogram_np

    tokenizer = get_tokenizer(args.qwen_pretrain_path)

    def mel_fn(wav: np.ndarray) -> np.ndarray:
        # host numpy: no per-utterance device round trip (train/train.py does
        # the same); GAN mel targets cap fmax at 8 kHz like the reference
        m = cfg.mel
        return mel_spectrogram_np(
            wav, m.n_fft, m.num_mels, m.sampling_rate,
            m.hop_size, m.win_size, m.fmin, 8000.0, m.center,
        ).T

    mesh = make_mesh(dp=-1, fsdp=1)
    gen_params = init_hift(jax.random.key(args.seed), cfg.hift)
    disc_params = init_discriminator(jax.random.key(args.seed + 1))
    gen_step, disc_step = make_gan_steps(cfg, tx, tx)
    rng = jax.random.key(args.seed)

    with open(args.train_data) as f:
        paths = [line.strip() for line in f if line.strip()]

    with mesh:
        gen_params = shard_params(gen_params, mesh)
        disc_params = shard_params(disc_params, mesh)
        opt_g, opt_d = tx.init(gen_params), tx.init(disc_params)
        step = 0
        for epoch in range(args.max_epoch):
            it = ds.build_pipeline(paths, tokenizer, mel_fn, 0, 1, epoch, gan=True)
            for batch in it:
                if "pitch_feat" not in batch or "speech" not in batch:
                    continue
                dev = shard_batch(
                    {k: jnp.asarray(v) for k, v in batch.items() if k != "utts"}, mesh
                )
                rng, k1, k2 = jax.random.split(rng, 3)
                # discriminator turn first (executor.py:121-134)
                disc_params, opt_d, m_d = disc_step(disc_params, opt_d, gen_params, dev, k1)
                gen_params, opt_g, m_g = gen_step(gen_params, opt_g, disc_params, dev, k2)
                step += 1
                if step % args.log_interval == 0:
                    logging.info(
                        "GAN step %d disc=%.4f gen=%.4f mel=%.4f", step,
                        float(m_d["loss"]), float(m_g["loss"]), float(m_g["loss_mel"]),
                    )
            save_checkpoint(
                args.model_dir, f"epoch_{epoch}_whole",
                {"generator": gen_params, "discriminator": disc_params},
                {"epoch": epoch, "step": step},
            )


if __name__ == "__main__":
    main()
