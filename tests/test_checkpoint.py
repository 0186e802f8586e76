"""Checkpoint conversion: synthetic torch-style state dicts -> pytrees.

Builds state dicts with the reference's key naming (validated against the
module trees in cosy_repo/cosyvoice/{llm/llm.py,flow/flow.py,
hifigan/generator.py}) and checks the converters consume every key and place
arrays correctly.
"""

import os

import numpy as np
import pytest

from cosyvoice2_eu_tpu.config import tiny_test_config
from cosyvoice2_eu_tpu.runtime import checkpoint as ckpt

CFG = tiny_test_config()


def _rand(shape, rng):
    return rng.standard_normal(shape).astype(np.float32)


def test_convert_llm_roundtrip():
    rng = np.random.default_rng(0)
    cfg = CFG.llm
    bb = cfg.backbone
    sd = {}
    base = "llm.model.model"
    sd[f"{base}.embed_tokens.weight"] = _rand((bb.vocab_size, bb.hidden_size), rng)
    sd[f"{base}.norm.weight"] = _rand((bb.hidden_size,), rng)
    sd["llm.model.lm_head.weight"] = _rand((bb.vocab_size, bb.hidden_size), rng)  # ignored
    q_dim, kv_dim = bb.num_heads * bb.head_dim, bb.num_kv_heads * bb.head_dim
    for i in range(bb.num_layers):
        pre = f"{base}.layers.{i}"
        sd[f"{pre}.input_layernorm.weight"] = _rand((bb.hidden_size,), rng)
        sd[f"{pre}.post_attention_layernorm.weight"] = _rand((bb.hidden_size,), rng)
        for n, (o, ii) in {
            "q_proj": (q_dim, bb.hidden_size),
            "k_proj": (kv_dim, bb.hidden_size),
            "v_proj": (kv_dim, bb.hidden_size),
        }.items():
            sd[f"{pre}.self_attn.{n}.weight"] = _rand((o, ii), rng)
            sd[f"{pre}.self_attn.{n}.bias"] = _rand((o,), rng)
        sd[f"{pre}.self_attn.o_proj.weight"] = _rand((bb.hidden_size, q_dim), rng)
        sd[f"{pre}.mlp.gate_proj.weight"] = _rand((bb.intermediate_size, bb.hidden_size), rng)
        sd[f"{pre}.mlp.up_proj.weight"] = _rand((bb.intermediate_size, bb.hidden_size), rng)
        sd[f"{pre}.mlp.down_proj.weight"] = _rand((bb.hidden_size, bb.intermediate_size), rng)
    sd["llm_embedding.weight"] = _rand((2, bb.hidden_size), rng)
    sd["speech_embedding.weight"] = _rand((cfg.full_vocab, bb.hidden_size), rng)
    sd["llm_decoder.weight"] = _rand((cfg.full_vocab, bb.hidden_size), rng)
    sd["llm_decoder.bias"] = _rand((cfg.full_vocab,), rng)

    params = ckpt.convert_llm(sd, cfg)
    np.testing.assert_array_equal(
        params["backbone"]["layers"][1]["q_proj"]["weight"],
        sd[f"{base}.layers.1.self_attn.q_proj.weight"],
    )
    np.testing.assert_array_equal(params["llm_decoder"]["bias"], sd["llm_decoder.bias"])


def _conformer_sd(sd, pre, d, ffn, heads, rng):
    for n in ["linear_q", "linear_k", "linear_v", "linear_out"]:
        sd[f"{pre}.self_attn.{n}.weight"] = _rand((d, d), rng)
        sd[f"{pre}.self_attn.{n}.bias"] = _rand((d,), rng)
    sd[f"{pre}.self_attn.linear_pos.weight"] = _rand((d, d), rng)
    sd[f"{pre}.self_attn.pos_bias_u"] = _rand((heads, d // heads), rng)
    sd[f"{pre}.self_attn.pos_bias_v"] = _rand((heads, d // heads), rng)
    sd[f"{pre}.feed_forward.w_1.weight"] = _rand((ffn, d), rng)
    sd[f"{pre}.feed_forward.w_1.bias"] = _rand((ffn,), rng)
    sd[f"{pre}.feed_forward.w_2.weight"] = _rand((d, ffn), rng)
    sd[f"{pre}.feed_forward.w_2.bias"] = _rand((d,), rng)
    for n in ["norm_mha", "norm_ff"]:
        sd[f"{pre}.{n}.weight"] = _rand((d,), rng)
        sd[f"{pre}.{n}.bias"] = _rand((d,), rng)


def _resnet_sd(sd, pre, din, dout, tdim, rng):
    for b, (i, o) in {"block1": (din, dout), "block2": (dout, dout)}.items():
        sd[f"{pre}.{b}.block.0.weight"] = _rand((o, i, 3), rng)
        sd[f"{pre}.{b}.block.0.bias"] = _rand((o,), rng)
        sd[f"{pre}.{b}.block.2.weight"] = _rand((o,), rng)
        sd[f"{pre}.{b}.block.2.bias"] = _rand((o,), rng)
    sd[f"{pre}.mlp.1.weight"] = _rand((dout, tdim), rng)
    sd[f"{pre}.mlp.1.bias"] = _rand((dout,), rng)
    sd[f"{pre}.res_conv.weight"] = _rand((dout, din, 1), rng)
    sd[f"{pre}.res_conv.bias"] = _rand((dout,), rng)


def _tf_sd(sd, pre, d, inner, rng):
    sd[f"{pre}.norm1.weight"] = _rand((d,), rng)
    sd[f"{pre}.norm1.bias"] = _rand((d,), rng)
    for n in ["to_q", "to_k", "to_v"]:
        sd[f"{pre}.attn1.{n}.weight"] = _rand((inner, d), rng)
    sd[f"{pre}.attn1.to_out.0.weight"] = _rand((d, inner), rng)
    sd[f"{pre}.attn1.to_out.0.bias"] = _rand((d,), rng)
    sd[f"{pre}.norm3.weight"] = _rand((d,), rng)
    sd[f"{pre}.norm3.bias"] = _rand((d,), rng)
    sd[f"{pre}.ff.net.0.proj.weight"] = _rand((4 * d, d), rng)
    sd[f"{pre}.ff.net.0.proj.bias"] = _rand((4 * d,), rng)
    sd[f"{pre}.ff.net.2.weight"] = _rand((d, 4 * d), rng)
    sd[f"{pre}.ff.net.2.bias"] = _rand((d,), rng)


def test_convert_flow_roundtrip():
    rng = np.random.default_rng(1)
    cfg = CFG.flow
    enc, est = cfg.encoder, cfg.estimator
    d, ffn, heads = enc.output_size, enc.linear_units, enc.attention_heads
    ch = est.channels[0]
    tdim = ch * 4
    inner = est.num_heads * est.attention_head_dim
    sd = {}
    sd["input_embedding.weight"] = _rand((cfg.vocab_size, cfg.input_size), rng)
    sd["spk_embed_affine_layer.weight"] = _rand((cfg.output_size, cfg.spk_embed_dim), rng)
    sd["spk_embed_affine_layer.bias"] = _rand((cfg.output_size,), rng)
    sd["encoder_proj.weight"] = _rand((cfg.output_size, d), rng)
    sd["encoder_proj.bias"] = _rand((cfg.output_size,), rng)
    for e, n in [("encoder.embed", None), ("encoder.up_embed", None)]:
        sd[f"{e}.out.0.weight"] = _rand((d, enc.input_size), rng)
        sd[f"{e}.out.0.bias"] = _rand((d,), rng)
        sd[f"{e}.out.1.weight"] = _rand((d,), rng)
        sd[f"{e}.out.1.bias"] = _rand((d,), rng)
    sd["encoder.pre_lookahead_layer.conv1.weight"] = _rand((d, d, enc.pre_lookahead_len + 1), rng)
    sd["encoder.pre_lookahead_layer.conv1.bias"] = _rand((d,), rng)
    sd["encoder.pre_lookahead_layer.conv2.weight"] = _rand((d, d, 3), rng)
    sd["encoder.pre_lookahead_layer.conv2.bias"] = _rand((d,), rng)
    for i in range(enc.num_blocks):
        _conformer_sd(sd, f"encoder.encoders.{i}", d, ffn, heads, rng)
    for i in range(enc.num_up_blocks):
        _conformer_sd(sd, f"encoder.up_encoders.{i}", d, ffn, heads, rng)
    sd["encoder.up_layer.conv.weight"] = _rand((d, d, enc.upsample_stride * 2 + 1), rng)
    sd["encoder.up_layer.conv.bias"] = _rand((d,), rng)
    sd["encoder.after_norm.weight"] = _rand((d,), rng)
    sd["encoder.after_norm.bias"] = _rand((d,), rng)

    sd["decoder.estimator.time_mlp.linear_1.weight"] = _rand((tdim, est.in_channels), rng)
    sd["decoder.estimator.time_mlp.linear_1.bias"] = _rand((tdim,), rng)
    sd["decoder.estimator.time_mlp.linear_2.weight"] = _rand((tdim, tdim), rng)
    sd["decoder.estimator.time_mlp.linear_2.bias"] = _rand((tdim,), rng)
    _resnet_sd(sd, "decoder.estimator.down_blocks.0.0", est.in_channels, ch, tdim, rng)
    for j in range(est.n_blocks):
        _tf_sd(sd, f"decoder.estimator.down_blocks.0.1.{j}", ch, inner, rng)
    sd["decoder.estimator.down_blocks.0.2.weight"] = _rand((ch, ch, 3), rng)
    sd["decoder.estimator.down_blocks.0.2.bias"] = _rand((ch,), rng)
    for i in range(est.num_mid_blocks):
        _resnet_sd(sd, f"decoder.estimator.mid_blocks.{i}.0", ch, ch, tdim, rng)
        for j in range(est.n_blocks):
            _tf_sd(sd, f"decoder.estimator.mid_blocks.{i}.1.{j}", ch, inner, rng)
    _resnet_sd(sd, "decoder.estimator.up_blocks.0.0", ch * 2, ch, tdim, rng)
    for j in range(est.n_blocks):
        _tf_sd(sd, f"decoder.estimator.up_blocks.0.1.{j}", ch, inner, rng)
    sd["decoder.estimator.up_blocks.0.2.weight"] = _rand((ch, ch, 3), rng)
    sd["decoder.estimator.up_blocks.0.2.bias"] = _rand((ch,), rng)
    sd["decoder.estimator.final_block.block.0.weight"] = _rand((ch, ch, 3), rng)
    sd["decoder.estimator.final_block.block.0.bias"] = _rand((ch,), rng)
    sd["decoder.estimator.final_block.block.2.weight"] = _rand((ch,), rng)
    sd["decoder.estimator.final_block.block.2.bias"] = _rand((ch,), rng)
    sd["decoder.estimator.final_proj.weight"] = _rand((est.out_channels, ch, 1), rng)
    sd["decoder.estimator.final_proj.bias"] = _rand((est.out_channels,), rng)

    params = ckpt.convert_flow(sd, cfg)
    np.testing.assert_array_equal(
        params["estimator"]["mid"][1]["resnet"]["mlp"]["weight"],
        sd["decoder.estimator.mid_blocks.1.0.mlp.1.weight"],
    )
    np.testing.assert_array_equal(
        params["encoder"]["encoders"][0]["self_attn"]["pos_bias_u"],
        sd["encoder.encoders.0.self_attn.pos_bias_u"],
    )
    # structural match against init output
    import jax

    from cosyvoice2_eu_tpu.models.flow import init_flow

    init_params = init_flow(jax.random.key(0), cfg)
    got_paths = {jax.tree_util.keystr(p) for p, _ in jax.tree.flatten_with_path(params)[0]}
    want_paths = {jax.tree_util.keystr(p) for p, _ in jax.tree.flatten_with_path(init_params)[0]}
    assert got_paths == want_paths


def test_convert_hift_with_weight_norm_keys():
    rng = np.random.default_rng(2)
    cfg = CFG.hift
    base = cfg.base_channels
    stft_ch = cfg.istft_n_fft + 2
    sd = {}

    def wn(pre, shape):
        sd[f"{pre}.weight_g"] = np.abs(_rand((shape[0], 1, 1), rng)) + 0.1
        sd[f"{pre}.weight_v"] = _rand(shape, rng)
        sd[f"{pre}.bias"] = _rand((shape[0],), rng)

    for i in range(cfg.f0_predictor.num_layers):
        cin = cfg.f0_predictor.in_channels if i == 0 else cfg.f0_predictor.cond_channels
        wn(f"f0_predictor.condnet.{2 * i}", (cfg.f0_predictor.cond_channels, cin, 3))
    sd["f0_predictor.classifier.weight"] = _rand((1, cfg.f0_predictor.cond_channels), rng)
    sd["f0_predictor.classifier.bias"] = _rand((1,), rng)
    sd["m_source.l_linear.weight"] = _rand((1, cfg.nb_harmonics + 1), rng)
    sd["m_source.l_linear.bias"] = _rand((1,), rng)
    wn("conv_pre", (base, cfg.in_channels, 7))
    down_cum = [15, 3, 1] if cfg.upsample_rates == (8, 5, 3) else None
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        # ConvTranspose1d weight: (in, out, k)
        wn(f"ups.{i}", (base // (2**i), base // (2 ** (i + 1)), k))
        ch = base // (2 ** (i + 1))
        du = down_cum[i]
        wn(f"source_downs.{i}", (ch, stft_ch, 1 if du == 1 else du * 2))
        for j in range(len(cfg.source_resblock_dilation_sizes[i])):
            ks = cfg.source_resblock_kernel_sizes[i]
            wn(f"source_resblocks.{i}.convs1.{j}", (ch, ch, ks))
            wn(f"source_resblocks.{i}.convs2.{j}", (ch, ch, ks))
            sd[f"source_resblocks.{i}.activations1.{j}.alpha"] = _rand((ch,), rng)
            sd[f"source_resblocks.{i}.activations2.{j}.alpha"] = _rand((ch,), rng)
        for j, ks in enumerate(cfg.resblock_kernel_sizes):
            idx = i * len(cfg.resblock_kernel_sizes) + j
            for jj in range(len(cfg.resblock_dilation_sizes[j])):
                wn(f"resblocks.{idx}.convs1.{jj}", (ch, ch, ks))
                wn(f"resblocks.{idx}.convs2.{jj}", (ch, ch, ks))
                sd[f"resblocks.{idx}.activations1.{jj}.alpha"] = _rand((ch,), rng)
                sd[f"resblocks.{idx}.activations2.{jj}.alpha"] = _rand((ch,), rng)
    wn("conv_post", (stft_ch, base // (2 ** len(cfg.upsample_rates)), 7))

    params = ckpt.convert_hift(sd, cfg)
    # weight norm folded: ||w|| along (in, k) == g
    w = params["conv_pre"]["weight"]
    g = sd["conv_pre.weight_g"][:, 0, 0]
    np.testing.assert_allclose(np.sqrt((w**2).sum(axis=(1, 2))), g, rtol=1e-5)

    import jax

    from cosyvoice2_eu_tpu.models.hift import init_hift

    init_params = init_hift(jax.random.key(0), cfg)
    got_paths = {jax.tree_util.keystr(p) for p, _ in jax.tree.flatten_with_path(params)[0]}
    want_paths = {jax.tree_util.keystr(p) for p, _ in jax.tree.flatten_with_path(init_params)[0]}
    assert got_paths == want_paths


@pytest.mark.slow
def test_native_extract_and_load_roundtrip(tmp_path):
    """Train->serve loop without torch: training checkpoints (orbax pytrees,
    train/executor.py) extracted by tools/extract_for_inference.py into a
    model dir are resolved by the run-id naming matrix and loaded by load()
    exactly like the reference's .pt files (cli/cosyvoice.py:239-268 +
    extract_model_for_inference.py analog)."""
    import jax

    import cosyvoice2_eu_tpu as cosy
    from cosyvoice2_eu_tpu.models.flow import init_flow
    from cosyvoice2_eu_tpu.models.hift import init_hift
    from cosyvoice2_eu_tpu.models.llm import init_lm
    from cosyvoice2_eu_tpu.train.executor import save_checkpoint
    from tools.extract_for_inference import extract

    cfg = tiny_test_config()
    exp = {k: str(tmp_path / f"{k}-fr") for k in ("llm", "flow", "hift")}
    for d in exp.values():
        os.makedirs(d)
    # llm/flow: two checkpoints each, second is better by cv_loss
    save_checkpoint(exp["llm"], "epoch_0_step_5",
                    init_lm(jax.random.key(9), cfg.llm), {"cv_loss": 2.0})
    save_checkpoint(exp["llm"], "epoch_1_step_10",
                    init_lm(jax.random.key(0), cfg.llm), {"cv_loss": 1.0})
    save_checkpoint(exp["flow"], "averaged-fr",
                    init_flow(jax.random.key(1), cfg.flow), {"cv_loss": 0.5})
    # hifigan: GAN 'whole' checkpoint ({generator, discriminator}), no cv_loss
    save_checkpoint(
        exp["hift"], "epoch_0_whole",
        {"generator": init_hift(jax.random.key(2), cfg.hift),
         "discriminator": {"dummy": np.zeros((2, 2), np.float32)}},
        {"epoch": 0},
    )

    model_dir = tmp_path / "model"
    run_id = "42-averaged-blanken-FR"
    p1 = extract(exp["llm"], "llm", str(model_dir), run_id=run_id)  # best cv
    assert p1.endswith(f"llm-{run_id}")
    extract(exp["flow"], "flow", str(model_dir), tag="averaged-fr", run_id=run_id)
    p3 = extract(exp["hift"], "hifigan", str(model_dir), run_id=run_id)  # latest
    assert p3.endswith(f"hift-{run_id}")

    files = cosy.resolve_checkpoint_files(
        str(model_dir), "llm_flow_hifigan",
        llm_run_id=run_id, flow_run_id=run_id, hifigan_run_id=run_id,
        final=False,
    )
    assert all(os.path.isdir(p) for p in files.values()), files

    api = cosy.load(
        model_dir=str(model_dir), config=cfg, seed=0, final=False,
        llm_run_id=run_id, flow_run_id=run_id, hifigan_run_id=run_id,
        compute_dtype="float32",
    )
    # extracted llm == best checkpoint (epoch_1_step_10, seeded 0)
    want = init_lm(jax.random.key(0), cfg.llm)
    got = api._model.params["llm"]
    a = jax.tree.leaves(want)[0]
    b = jax.tree.leaves(got)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=0)
    # hift params carry no GAN wrapper
    assert "generator" not in api._model.params["hift"]

    rng = np.random.default_rng(0)
    from cosyvoice2_eu_tpu.utils.synthetic import synthetic_prompt

    prompt = synthetic_prompt(cfg, rng, 6)
    wav = np.concatenate(list(api._model.tts(prompt, stream=False)))
    assert wav.size > 0 and np.isfinite(wav).all()
