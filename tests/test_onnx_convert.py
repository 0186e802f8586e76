"""ONNX -> JAX conversion, verified against the numpy graph executor.

Builds synthetic ONNX files shaped like torch.onnx.export output for the two
frontend binaries (S3Tokenizer-v2 / CAM++ topologies, reference
cli/frontend.py:262-283), runs the structural converter
(runtime/onnx_convert.py), and checks the converted JAX models reproduce the
graph's own arithmetic: token-exact for the FSQ tokenizer, cosine ~ 1 for the
x-vector.  This pins the exact mapping logic that will run on the real
``speech_tokenizer_v2.onnx`` / ``campplus.onnx`` files.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from cosyvoice2_eu_tpu.models import campplus as cam
from cosyvoice2_eu_tpu.models import speech_tokenizer as st
from cosyvoice2_eu_tpu.runtime.onnx_convert import (
    convert_campplus,
    convert_speech_tokenizer,
    fuse_layer_norms,
)
from cosyvoice2_eu_tpu.runtime.onnx_exec import run_graph
from cosyvoice2_eu_tpu.runtime.onnx_import import load_onnx

from onnx_builder import GraphBuilder


def _i64(vals):
    return np.asarray(vals, np.int64)


def _f32(v):
    return np.asarray(v, np.float32)


def _gelu(g, x):
    """Erf-decomposed GELU, as torch exports it."""
    d = g.add("Div", [x, g.init(_f32(math.sqrt(2.0)))])
    e = g.add("Erf", [d])
    a = g.add("Add", [e, g.init(_f32(1.0))])
    m = g.add("Mul", [x, a])
    return g.add("Mul", [m, g.init(_f32(0.5))])


# ---------------------------------------------------------------------------
# speech tokenizer
# ---------------------------------------------------------------------------

def build_tokenizer_onnx(path, rng, t_in=48, n_mels=16, d=32, heads=4,
                         layers=2, ffn=64, fsq=8, fused_qkv=False):
    g = GraphBuilder()
    hd = d // heads
    t1 = (t_in - 1) // 2 + 1
    t_out = (t1 - 1) // 2 + 1

    def conv(x, cin, cout):
        w = g.init(rng.standard_normal((cout, cin, 3)).astype(np.float32) * 0.2)
        b = g.init(rng.standard_normal(cout).astype(np.float32) * 0.1)
        return g.add("Conv", [x, w, b], strides=[2], pads=[1, 1],
                     dilations=[1], group=1)

    def linear(x, cin, cout, bias=True, bias_vec=None):
        w = rng.standard_normal((cout, cin)).astype(np.float32) * (0.4 / math.sqrt(cin))
        y = g.add("MatMul", [x, g.init(w.T.copy())])  # MatMul stores (in, out)
        if bias:
            b = bias_vec if bias_vec is not None else \
                rng.standard_normal(cout).astype(np.float32) * 0.05
            y = g.add("Add", [y, g.init(b)])
        return y

    x = _gelu(g, conv("mel", n_mels, d))
    x = _gelu(g, conv(x, d, d))
    x = g.add("Transpose", [x], perm=[0, 2, 1])
    pos = np.asarray(st._sinusoid_pos(t_out, d), np.float32)
    x = g.add("Add", [x, g.init(pos, "pos")])

    def ln(x):
        s = g.init(1.0 + 0.1 * rng.standard_normal(d).astype(np.float32))
        b = g.init(rng.standard_normal(d).astype(np.float32) * 0.05)
        return g.add("LayerNormalization", [x, s, b], axis=-1, epsilon=1e-5)

    for _ in range(layers):
        h = ln(x)
        if fused_qkv:
            # torch fused in_proj export: one (3d) linear then Split; the k
            # bias slice is zero (whisper keys are bias-free)
            b3 = np.concatenate([
                rng.standard_normal(d).astype(np.float32) * 0.05,
                np.zeros(d, np.float32),
                rng.standard_normal(d).astype(np.float32) * 0.05,
            ])
            qkv = linear(h, d, 3 * d, bias_vec=b3)
            q, k, v = g.add("Split", [qkv], n_out=3, axis=-1, num_outputs=3)
        else:
            q = linear(h, d, d)
            k = linear(h, d, d, bias=False)
            v = linear(h, d, d)

        def split_heads(y, perm):
            r = g.add("Reshape", [y, g.init(_i64([1, t_out, heads, hd]))])
            return g.add("Transpose", [r], perm=perm)

        qt = split_heads(q, [0, 2, 1, 3])
        kt = split_heads(k, [0, 2, 3, 1])
        vt = split_heads(v, [0, 2, 1, 3])
        sc = g.add("MatMul", [qt, kt])
        sc = g.add("Mul", [sc, g.init(_f32(1.0 / math.sqrt(hd)))])
        p = g.add("Softmax", [sc], axis=-1)
        ctx = g.add("MatMul", [p, vt])
        ctx = g.add("Transpose", [ctx], perm=[0, 2, 1, 3])
        ctx = g.add("Reshape", [ctx, g.init(_i64([1, t_out, d]))])
        x = g.add("Add", [x, linear(ctx, d, d)])
        h = ln(x)
        f = _gelu(g, linear(h, d, ffn))
        x = g.add("Add", [x, linear(f, ffn, d)])

    z = linear(x, d, fsq)
    th = g.add("Tanh", [z])
    m = g.add("Mul", [th, g.init(_f32(st.FSQ_TANH_SCALE))])
    r = g.add("Round", [m])
    dg = g.add("Add", [r, g.init(_f32(1.0))])
    pw = g.add("Mul", [dg, g.init(_f32(3.0 ** np.arange(fsq)))])
    s = g.add("ReduceSum", [pw], axes=[-1], keepdims=0)
    codes = g.add("Cast", [s], to=7)
    return g.save(str(path), ["mel"], [codes])


def test_tokenizer_convert_token_exact(tmp_path):
    rng = np.random.default_rng(0)
    t_in = 48
    path = build_tokenizer_onnx(tmp_path / "tok.onnx", rng, t_in=t_in)
    model = load_onnx(path)

    params, cfg = convert_speech_tokenizer(model)
    assert cfg.n_mels == 16 and cfg.d_model == 32 and cfg.num_layers == 2
    assert cfg.num_heads == 4 and cfg.ffn_dim == 64 and cfg.conv_strides == (2, 2)
    assert "positional_embedding" in params

    mel = rng.standard_normal((1, 16, t_in)).astype(np.float32)
    ref = run_graph(model, {"mel": mel})[0]
    codes, code_len = st.encode(params, cfg, jnp.asarray(mel), jnp.asarray([t_in]))
    assert int(code_len[0]) == ref.shape[-1]
    np.testing.assert_array_equal(np.asarray(codes)[0], ref.reshape(-1))


def test_fuse_layer_norms(tmp_path):
    """Decomposed (opset<17) LayerNorm chains re-fuse for the converter."""
    g = GraphBuilder()
    d = 8
    scale = g.init(1.0 + 0.1 * np.arange(d, dtype=np.float32))
    bias = g.init(0.01 * np.arange(d, dtype=np.float32))
    m1 = g.add("ReduceMean", ["x"], axes=[-1], keepdims=1)
    sub = g.add("Sub", ["x", m1])
    pw = g.add("Pow", [sub, g.init(_f32(2.0))])
    m2 = g.add("ReduceMean", [pw], axes=[-1], keepdims=1)
    ad = g.add("Add", [m2, g.init(_f32(1e-5))])
    sq = g.add("Sqrt", [ad])
    dv = g.add("Div", [sub, sq])
    mu = g.add("Mul", [dv, scale])
    out = g.add("Add", [mu, bias])
    path = g.save(str(tmp_path / "ln.onnx"), ["x"], [out])

    model = load_onnx(path)
    fused = fuse_layer_norms(model)
    lns = [n for n in fused if n["op_type"] == "LayerNormalization"]
    assert len(lns) == 1 and len(fused) == 1
    assert lns[0]["input"][0] == "x"
    assert abs(lns[0]["attrs"]["epsilon"] - 1e-5) < 1e-12

    # fused node executes identically to the decomposed graph
    x = np.random.default_rng(1).standard_normal((2, 5, d)).astype(np.float32)
    ref = run_graph(model, {"x": x})[0]
    got = run_graph({"initializers": model["initializers"], "nodes": fused,
                     "inputs": ["x"], "outputs": [lns[0]["output"][0]]}, {"x": x})[0]
    np.testing.assert_allclose(got, ref, atol=1e-6)


# ---------------------------------------------------------------------------
# CAM++
# ---------------------------------------------------------------------------

def build_campplus_onnx(path, cfg: cam.CAMPPlusConfig, rng, t_in=60):
    g = GraphBuilder()

    def conv2(x, cin, cout, k, stride=(1, 1), pad=(1, 1)):
        w = g.init(rng.standard_normal((cout, cin, k, k)).astype(np.float32)
                   * (0.5 / math.sqrt(cin * k * k)))
        return g.add("Conv", [x, w], strides=list(stride),
                     pads=[pad[0], pad[1], pad[0], pad[1]],
                     dilations=[1, 1], group=1)

    def conv1(x, cin, cout, k, stride=1, pad=0, dil=1, bias=False):
        w = g.init(rng.standard_normal((cout, cin, k)).astype(np.float32)
                   * (0.5 / math.sqrt(cin * k)))
        ins = [x, w]
        if bias:
            ins.append(g.init(rng.standard_normal(cout).astype(np.float32) * 0.05))
        return g.add("Conv", ins, strides=[stride], pads=[pad, pad],
                     dilations=[dil], group=1)

    def bn(x, c):
        s = g.init((0.5 + rng.random(c)).astype(np.float32))
        b = g.init(rng.standard_normal(c).astype(np.float32) * 0.1)
        m = g.init(rng.standard_normal(c).astype(np.float32) * 0.1)
        v = g.init((0.5 + rng.random(c)).astype(np.float32))
        return g.add("BatchNormalization", [x, s, b, m, v], epsilon=1e-5)

    def relu(x):
        return g.add("Relu", [x])

    fc = cfg.fcm_channels
    x = g.add("Transpose", ["fbank"], perm=[0, 2, 1])
    x = g.add("Unsqueeze", [x, g.init(_i64([1]))])
    x = relu(bn(conv2(x, 1, fc, 3), fc))
    for n_blocks in cfg.fcm_blocks:
        for bi in range(n_blocks):
            stride = 2 if bi == 0 else 1
            h = relu(bn(conv2(x, fc, fc, 3, (stride, 1)), fc))
            h = bn(conv2(h, fc, fc, 3), fc)
            sc = bn(conv2(x, fc, fc, 1, (stride, 1), (0, 0)), fc) if stride != 1 else x
            x = relu(g.add("Add", [h, sc]))
    x = relu(bn(conv2(x, fc, fc, 3, (2, 1)), fc))
    freq = cfg.feat_dim // (2 ** (len(cfg.fcm_blocks) + 1))
    t = t_in
    x = g.add("Reshape", [x, g.init(_i64([1, fc * freq, t]))])

    x = conv1(x, fc * freq, cfg.init_channels, 5, stride=2, pad=2)
    t = (t + 4 - 5) // 2 + 1
    x = relu(bn(x, cfg.init_channels))

    def seg_pool(h, c):
        s_count = -(-t // cfg.seg_len)
        sp = g.add("AveragePool", [h], kernel_shape=[cfg.seg_len],
                   strides=[cfg.seg_len], ceil_mode=1)
        u = g.add("Unsqueeze", [sp, g.init(_i64([3]))])
        e = g.add("Expand", [u, g.init(_i64([1, c, s_count, cfg.seg_len]))])
        r = g.add("Reshape", [e, g.init(_i64([1, c, -1]))])
        return g.add("Slice", [r, g.init(_i64([0])), g.init(_i64([t])),
                               g.init(_i64([2])), g.init(_i64([1]))])

    channels = cfg.init_channels
    for n_layers, dil in zip(cfg.block_layers, cfg.block_dilations):
        for _ in range(n_layers):
            h = relu(bn(x, channels))
            h = conv1(h, channels, cfg.bn_channels, 1)
            h = relu(bn(h, cfg.bn_channels))
            pad = dil * (cfg.kernel_size - 1) // 2
            y = conv1(h, cfg.bn_channels, cfg.growth_rate, cfg.kernel_size,
                      pad=pad, dil=dil)
            gm = g.add("ReduceMean", [h], axes=[2], keepdims=1)
            ctx = g.add("Add", [gm, seg_pool(h, cfg.bn_channels)])
            g1 = relu(conv1(ctx, cfg.bn_channels, cfg.bn_channels // 2, 1, bias=True))
            mgate = g.add("Sigmoid", [conv1(g1, cfg.bn_channels // 2,
                                            cfg.growth_rate, 1, bias=True)])
            out = g.add("Mul", [y, mgate])
            x = g.add("Concat", [x, out], axis=1)
            channels += cfg.growth_rate
        h = relu(bn(x, channels))
        x = conv1(h, channels, channels // 2, 1)
        channels //= 2

    x = relu(bn(x, channels))
    mean = g.add("ReduceMean", [x], axes=[2], keepdims=1)
    d = g.add("Sub", [x, mean])
    sq = g.add("Mul", [d, d])
    ssum = g.add("ReduceSum", [sq], axes=[2], keepdims=0)
    var = g.add("Mul", [ssum, g.init(_f32(1.0 / (t - 1)))])
    std = g.add("Sqrt", [var])
    meanf = g.add("Squeeze", [mean, g.init(_i64([2]))])
    stats = g.add("Concat", [meanf, std], axis=1)
    u = g.add("Unsqueeze", [stats, g.init(_i64([2]))])
    e = conv1(u, channels * 2, cfg.embedding_size, 1)
    eb = bn(e, cfg.embedding_size)
    emb = g.add("Squeeze", [eb, g.init(_i64([2]))])
    return g.save(str(path), ["fbank"], [emb])


@pytest.mark.parametrize("infer_cfg", [False, True])
def test_campplus_convert_cosine(tmp_path, infer_cfg):
    cfg = cam.tiny_campplus_config()
    rng = np.random.default_rng(2)
    t_in = 60
    path = build_campplus_onnx(tmp_path / "cam.onnx", cfg, rng, t_in=t_in)
    model = load_onnx(path)

    params, got_cfg = convert_campplus(model, None if infer_cfg else cfg)
    if infer_cfg:
        assert got_cfg.fcm_blocks == cfg.fcm_blocks
        assert got_cfg.block_layers == cfg.block_layers
        assert got_cfg.block_dilations == cfg.block_dilations
        assert got_cfg.feat_dim == cfg.feat_dim
        assert got_cfg.embedding_size == cfg.embedding_size

    fbank = rng.standard_normal((1, t_in, cfg.feat_dim)).astype(np.float32)
    ref = run_graph(model, {"fbank": fbank})[0].reshape(-1)
    # seg_len is a runtime knob, not in the graph; carry it over explicitly
    import dataclasses
    run_cfg = dataclasses.replace(got_cfg, seg_len=cfg.seg_len)
    out = np.asarray(cam.campplus_forward(params, run_cfg, jnp.asarray(fbank)))[0]
    cos = float(np.dot(ref, out) / (np.linalg.norm(ref) * np.linalg.norm(out)))
    assert cos > 0.9999
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)


def test_executor_op_matrix(tmp_path):
    """Spot-check executor ops real exports rely on that the model graphs
    don't exercise: Gemm transB+beta, Slice with INT_MAX end and negative
    axis, Split, Pad reflect, Clip, Where/Equal/Cast chains, Pow."""
    g = GraphBuilder()
    x = "x"  # (2, 6) float32
    # Gemm: y = 0.5 * x @ W^T + 2.0 * bias_row
    w = g.init(np.arange(12, dtype=np.float32).reshape(2, 6))
    c = g.init(np.ones((2, 2), np.float32))
    gemm = g.add("Gemm", [x, w, c], alpha=0.5, beta=2.0, transB=1)
    # Slice last axis [1:INT_MAX]
    sl = g.add("Slice", [x, g.init(_i64([1])), g.init(_i64([2147483647])),
                         g.init(_i64([-1])), g.init(_i64([1]))])
    # Split into 2 along axis 1
    s1, s2 = g.add("Split", [x], n_out=2, axis=1, num_outputs=2)
    pad = g.add("Pad", [x, g.init(_i64([0, 1, 0, 1]))], mode=b"reflect")
    cl = g.add("Clip", [x, g.init(_f32(-0.5)), g.init(_f32(0.5))])
    eq = g.add("Equal", [x, g.init(_f32(0.0))])
    wh = g.add("Where", [eq, g.init(_f32(9.0)), x])
    pw = g.add("Pow", [x, g.init(_f32(2.0))])
    cast = g.add("Cast", [pw], to=6)  # int32
    path = g.save(str(tmp_path / "ops.onnx"),
                  ["x"], [gemm, sl, s1, s2, pad, cl, wh, cast])

    model = load_onnx(path)
    xv = np.linspace(-1.5, 1.5, 12, dtype=np.float32).reshape(2, 6)
    outs = run_graph(model, {"x": xv})
    np.testing.assert_allclose(
        outs[0], 0.5 * (xv @ np.arange(12, dtype=np.float32).reshape(2, 6).T) + 2.0,
        rtol=1e-6)
    np.testing.assert_allclose(outs[1], xv[:, 1:])
    np.testing.assert_allclose(outs[2], xv[:, :3])
    np.testing.assert_allclose(outs[3], xv[:, 3:])
    np.testing.assert_allclose(outs[4], np.pad(xv, ((0, 0), (1, 1)), mode="reflect"))
    np.testing.assert_allclose(outs[5], np.clip(xv, -0.5, 0.5))
    np.testing.assert_allclose(outs[6], np.where(xv == 0.0, 9.0, xv))
    assert outs[7].dtype == np.int32
    np.testing.assert_allclose(outs[7], (xv ** 2).astype(np.int32))
