"""Real-weights robustness: perturbed export variants + executor fallback.

First contact with the real ``speech_tokenizer_v2.onnx`` / ``campplus.onnx``
may present torch-export variants the happy-path tests don't: fused QKV
in_proj, Identity/Dropout/no-op-Cast plumbing nodes, mangled node names, or a
topology the structural converter cannot map at all.  These tests pin that:

  1. simplify_graph splices plumbing nodes without changing arithmetic,
  2. the structural converter survives perturbed graphs token-exact,
  3. fused-QKV exports convert token-exact,
  4. when conversion DOES fail, load_frontend_fns falls back to the numpy
     graph executor and still produces the graph's own tokens/x-vectors.

Reference behavior being protected: cli/frontend.py:262-283.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from cosyvoice2_eu_tpu.models import speech_tokenizer as st
from cosyvoice2_eu_tpu.runtime.onnx_convert import (
    convert_speech_tokenizer,
    simplify_graph,
)
from cosyvoice2_eu_tpu.runtime.onnx_exec import run_graph
from cosyvoice2_eu_tpu.runtime.onnx_import import load_onnx

from onnx_builder import GraphBuilder
from test_onnx_convert import build_tokenizer_onnx


def _perturb(model, with_identity=True, with_cast=True, rename=True):
    """Insert Identity / f32->f32 Cast nodes after every other node and
    mangle node names — mimicking what graph optimizers and re-exports do."""
    nodes = []
    for i, n in enumerate(model["nodes"]):
        n = dict(n)
        if rename:
            n["name"] = f"mangled_{i}"
        if n["output"] and n["output"][0] and i % 2 == 0:
            orig = n["output"][0]
            raw = orig + "__raw"
            n["output"] = [raw] + list(n["output"][1:])
            nodes.append(n)
            if with_cast and i % 4 == 0:
                mid = orig + "__cast"
                nodes.append({"op_type": "Cast", "input": [raw], "output": [mid],
                              "name": f"cast_{i}", "attrs": {"to": 1}})
                nodes.append({"op_type": "Identity", "input": [mid],
                              "output": [orig], "name": f"id_{i}", "attrs": {}})
            elif with_identity:
                nodes.append({"op_type": "Identity", "input": [raw],
                              "output": [orig], "name": f"id_{i}", "attrs": {}})
            else:
                n["output"] = [orig] + list(n["output"][1:])
        else:
            nodes.append(n)
    return {**model, "nodes": nodes}


def test_simplify_graph_splices_plumbing(tmp_path):
    rng = np.random.default_rng(0)
    path = build_tokenizer_onnx(tmp_path / "tok.onnx", rng)
    model = load_onnx(path)
    perturbed = _perturb(model)
    n_extra = len(perturbed["nodes"]) - len(model["nodes"])
    assert n_extra > 10, "perturbation added no plumbing nodes"

    simp = simplify_graph(perturbed)
    assert len(simp["nodes"]) == len(model["nodes"])
    # identical arithmetic
    mel = rng.standard_normal((1, 16, 48)).astype(np.float32)
    ref = run_graph(model, {"mel": mel})[0]
    got = run_graph(simp, {"mel": mel})[0]
    np.testing.assert_array_equal(got, ref)


def test_simplify_keeps_int_to_float_cast(tmp_path):
    """Shape -> Cast(FLOAT) -> Div(x, 2.0) — the common torch-export pattern:
    the Cast's TARGET is float but its SOURCE is int64, so splicing it would
    hand run_graph two integer operands and truncate 3/2 -> 1.  simplify must
    keep it (dtype inference, not target-type alone, decides transparency)."""
    g = GraphBuilder()
    shp = g.add("Shape", ["x"])                      # [1, 3] int64
    cst = g.add("Cast", [shp], to=1)                 # -> float32
    half = g.init(np.asarray(2.0, np.float32), "half")
    out = g.add("Div", [cst, half])
    path = g.save(tmp_path / "m.onnx", ["x"], [out])
    model = load_onnx(path)
    simp = simplify_graph(model)
    assert sum(n["op_type"] == "Cast" for n in simp["nodes"]) == 1
    x = np.zeros((1, 3), np.float32)
    res = run_graph(simp, {"x": x})[0]
    np.testing.assert_allclose(np.asarray(res), [0.5, 1.5])

    # and a genuinely float->float Cast in the same graph IS spliced
    g2 = GraphBuilder()
    c1 = g2.add("Cast", ["x"], to=1)                 # f32 -> f32 (input typed)
    two = g2.init(np.asarray(2.0, np.float32), "two")
    out2 = g2.add("Mul", [c1, two])
    p2 = g2.save(tmp_path / "m2.onnx", ["x"], [out2])
    simp2 = simplify_graph(load_onnx(p2))
    assert sum(n["op_type"] == "Cast" for n in simp2["nodes"]) == 0


def test_convert_survives_perturbed_graph(tmp_path):
    """Identity/Cast plumbing + renamed nodes: structural conversion still
    yields token-exact output (the perturbed graph is its own ground truth)."""
    rng = np.random.default_rng(1)
    t_in = 48
    path = build_tokenizer_onnx(tmp_path / "tok.onnx", rng, t_in=t_in)
    model = load_onnx(path)
    perturbed = _perturb(model)

    params, cfg = convert_speech_tokenizer(perturbed)
    mel = rng.standard_normal((1, 16, t_in)).astype(np.float32)
    ref = run_graph(perturbed, {"mel": mel})[0]
    codes, code_len = st.encode(params, cfg, jnp.asarray(mel), jnp.asarray([t_in]))
    np.testing.assert_array_equal(
        np.asarray(codes)[0, : int(code_len[0])], np.asarray(ref).reshape(-1)
    )


def test_convert_fused_qkv_token_exact(tmp_path):
    rng = np.random.default_rng(2)
    t_in = 48
    path = build_tokenizer_onnx(tmp_path / "tok.onnx", rng, t_in=t_in,
                                fused_qkv=True)
    model = load_onnx(path)

    params, cfg = convert_speech_tokenizer(model)
    assert cfg.num_layers == 2
    mel = rng.standard_normal((1, 16, t_in)).astype(np.float32)
    ref = run_graph(model, {"mel": mel})[0]
    codes, code_len = st.encode(params, cfg, jnp.asarray(mel), jnp.asarray([t_in]))
    np.testing.assert_array_equal(
        np.asarray(codes)[0, : int(code_len[0])], np.asarray(ref).reshape(-1)
    )


def build_unconvertible_tokenizer(path, rng, t_in=48):
    """A valid-but-unfamiliar tokenizer topology the structural converter's
    invariants reject (single conv, no LN pairs) — semantics still executable."""
    g = GraphBuilder()
    d = 8
    w1 = g.init(rng.standard_normal((16, d)).astype(np.float32))
    # minimal valid-but-unknown topology: single conv + matmul chain that the
    # converter's invariants reject (no LN pairs, matmul count 2)
    cw = g.init(rng.standard_normal((d, 16, 3)).astype(np.float32) * 0.2)
    x = g.add("Conv", ["mel", cw], strides=[2], pads=[1, 1], dilations=[1], group=1)
    x = g.add("Transpose", [x], perm=[0, 2, 1])
    z = g.add("MatMul", [x, g.init(rng.standard_normal((d, 4)).astype(np.float32))])
    th = g.add("Tanh", [z])
    m = g.add("Mul", [th, g.init(np.float32(st.FSQ_TANH_SCALE))])
    r = g.add("Round", [m])
    dg = g.add("Add", [r, g.init(np.float32(1.0))])
    pw = g.add("Mul", [dg, g.init((3.0 ** np.arange(4)).astype(np.float32))])
    s = g.add("ReduceSum", [pw], axes=[-1], keepdims=0)
    codes = g.add("Cast", [s], to=7)
    return g.save(str(path), ["mel"], [codes])


def test_load_fallback_to_executor(tmp_path, caplog):
    """Structural conversion fails -> load_frontend_fns returns an
    executor-backed tokenizer fn producing the graph's own codes."""
    import logging

    from cosyvoice2_eu_tpu.ops.mel import whisper_log_mel
    from cosyvoice2_eu_tpu.runtime.onnx_fallback import load_frontend_fns

    rng = np.random.default_rng(3)
    st_path = tmp_path / "speech_tokenizer_v2.onnx"
    build_unconvertible_tokenizer(st_path, rng)

    with pytest.raises(Exception):
        convert_speech_tokenizer(load_onnx(str(st_path)))

    with caplog.at_level(logging.WARNING):
        st_fn, cam_fn = load_frontend_fns(str(st_path), None)
    assert st_fn is not None and cam_fn is None
    assert any("falling back" in r.message for r in caplog.records)

    wav = (rng.standard_normal(48 * 160) * 0.05).astype(np.float32)
    codes = st_fn(wav)
    # ground truth: same mel through the raw graph
    mel = np.asarray(whisper_log_mel(jnp.asarray(wav[None]), n_mels=16))
    model = load_onnx(str(st_path))
    ref = run_graph(model, {model["inputs"][0]: mel})[0].reshape(-1)
    np.testing.assert_array_equal(codes, ref.astype(np.int32))


def test_strict_mode_reraises(tmp_path):
    from cosyvoice2_eu_tpu.runtime.onnx_fallback import load_frontend_fns

    rng = np.random.default_rng(4)
    st_path = tmp_path / "speech_tokenizer_v2.onnx"
    build_unconvertible_tokenizer(st_path, rng)
    with pytest.raises(Exception):
        load_frontend_fns(str(st_path), None, strict=True)


def test_forced_executor_env(tmp_path, monkeypatch):
    """COSY2EU_ONNX_EXECUTOR=1 bypasses structural conversion even when it
    would succeed — A/B debugging knob."""
    from cosyvoice2_eu_tpu.ops.mel import whisper_log_mel
    from cosyvoice2_eu_tpu.runtime.onnx_fallback import load_frontend_fns

    rng = np.random.default_rng(5)
    st_path = tmp_path / "speech_tokenizer_v2.onnx"
    build_tokenizer_onnx(st_path, rng)
    monkeypatch.setenv("COSY2EU_ONNX_EXECUTOR", "1")
    st_fn, _ = load_frontend_fns(str(st_path), None)
    wav = (rng.standard_normal(48 * 160) * 0.05).astype(np.float32)
    codes = st_fn(wav)
    mel = np.asarray(whisper_log_mel(jnp.asarray(wav[None]), n_mels=16))
    model = load_onnx(str(st_path))
    ref = run_graph(model, {model["inputs"][0]: mel})[0].reshape(-1)
    np.testing.assert_array_equal(codes, ref.astype(np.int32))


def test_executor_extended_ops(tmp_path):
    """Ops real torch exports rely on beyond the model graphs: integer Div
    (shape arithmetic), negative Gather indices, Sin/Cos, Mod, LeakyRelu,
    ArgMax, Trilu, Shape start/end."""
    g = GraphBuilder()
    shp = g.add("Shape", ["x"])                       # (2, 6) -> [2, 6]
    half = g.add("Div", [shp, g.init(np.asarray([1, 2], np.int64))])
    gat = g.add("Gather", ["x", g.init(np.asarray([-1], np.int64))], axis=1)
    sin = g.add("Sin", ["x"])
    cos = g.add("Cos", ["x"])
    md = g.add("Mod", ["x", g.init(np.float32(1.5))], fmod=1)
    lr = g.add("LeakyRelu", ["x"], alpha=0.1)
    am = g.add("ArgMax", ["x"], axis=1, keepdims=0)
    tri = g.add("Trilu", ["x"], upper=0)
    shp2 = g.add("Shape", ["x"], start=1)
    path = g.save(str(tmp_path / "ops2.onnx"), ["x"],
                  [half, gat, sin, cos, md, lr, am, tri, shp2])

    model = load_onnx(path)
    xv = np.linspace(-2, 2, 12, dtype=np.float32).reshape(2, 6)
    outs = run_graph(model, {"x": xv})
    np.testing.assert_array_equal(outs[0], [2, 3])
    assert outs[0].dtype == np.int64
    np.testing.assert_allclose(outs[1], xv[:, [-1]])
    np.testing.assert_allclose(outs[2], np.sin(xv), rtol=1e-6)
    np.testing.assert_allclose(outs[3], np.cos(xv), rtol=1e-6)
    np.testing.assert_allclose(outs[4], np.fmod(xv, 1.5), rtol=1e-6)
    np.testing.assert_allclose(outs[5], np.where(xv > 0, xv, 0.1 * xv), rtol=1e-6)
    np.testing.assert_array_equal(outs[6], np.argmax(xv, axis=1))
    np.testing.assert_allclose(outs[7], np.tril(xv))
    np.testing.assert_array_equal(outs[8], [6])
