"""Serving layer: proto codegen, gRPC round trip, stdlib HTTP round trip."""

import base64
import io
import json
import threading
import time
import wave

import jax
import numpy as np
import pytest

import cosyvoice2_eu_tpu as cosy
from cosyvoice2_eu_tpu.config import tiny_test_config


@pytest.fixture(scope="module")
def api():
    cfg = tiny_test_config()
    return cosy.load(model_dir=None, config=cfg, seed=0, compute_dtype="float32")


def _prompt_wav_bytes(seconds=0.5, sr=16000) -> bytes:
    rng = np.random.default_rng(0)
    pcm = (rng.standard_normal(int(seconds * sr)) * 3000).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def _patch_frontend(api):
    """tiny config has no trained speech tokenizer/xvector; inject stubs."""
    rng = np.random.default_rng(1)
    cfg = tiny_test_config()
    api._frontend.speech_tokenizer_fn = lambda wav: rng.integers(
        0, cfg.flow.vocab_size, max(len(wav) // 640, 2)
    ).astype(np.int32)
    api._frontend.spk_embedding_fn = lambda wav: rng.standard_normal(192).astype(np.float32)

    # tiny flow has 16 mel bins, but frontend mel_fn makes 80; stub it
    def mel_fn(wav24):
        return rng.standard_normal((len(wav24) // 480, cfg.flow.output_size)).astype(np.float32)

    api._frontend.mel_fn = mel_fn


def test_proto_roundtrip():
    from cosyvoice2_eu_tpu.serving.proto import build_messages

    pb2 = build_messages()
    req = pb2.Request(
        zero_shot_request=pb2.zeroshotRequest(
            tts_text="bonjour", prompt_text="salut", prompt_audio=b"\x01\x02"
        )
    )
    data = req.SerializeToString()
    back = pb2.Request.FromString(data)
    assert back.WhichOneof("RequestPayload") == "zero_shot_request"
    assert back.zero_shot_request.tts_text == "bonjour"


@pytest.mark.slow
def test_grpc_server_roundtrip(api):
    grpc = pytest.importorskip("grpc")
    from cosyvoice2_eu_tpu.serving.grpc_server import make_client_stub, serve

    _patch_frontend(api)
    server = serve(api, port=50911, max_workers=2)
    try:
        channel = grpc.insecure_channel("localhost:50911")
        Stub, pb2 = make_client_stub(channel)
        pcm = (np.zeros(8000) * 32767).astype(np.int16).tobytes()
        req = pb2.Request(
            cross_lingual_request=pb2.crosslingualRequest(
                tts_text="bonjour le monde", prompt_audio=pcm
            )
        )
        chunks = [r.tts_audio for r in Stub.Inference(req, timeout=600)]
        assert chunks and all(len(c) % 2 == 0 for c in chunks)
        audio = np.frombuffer(b"".join(chunks), np.int16)
        assert len(audio) > 0
    finally:
        server.stop(0)


def test_http_server_roundtrip(api):
    import http.client

    from cosyvoice2_eu_tpu.serving.http_server import serve_stdlib

    _patch_frontend(api)
    server = serve_stdlib(api, host="127.0.0.1", port=50912)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", 50912, timeout=600)
        body = json.dumps(
            {
                "tts_text": "bonjour le monde",
                "prompt_wav_b64": base64.b64encode(_prompt_wav_bytes()).decode(),
            }
        )
        conn.request("POST", "/inference_cross_lingual", body)
        resp = conn.getresponse()
        assert resp.status == 200
        data = resp.read()
        assert len(data) > 0 and len(data) % 2 == 0
    finally:
        server.shutdown()


def test_http_routes_through_engine(api):
    """--engine-slots wiring: the HTTP route handlers run unchanged over the
    EngineAPI facade (zero_shot + sft through the batching engine)."""
    from cosyvoice2_eu_tpu.serving.engine import EngineAPI
    from cosyvoice2_eu_tpu.serving.http_server import _routes

    _patch_frontend(api)
    eng = EngineAPI(api, n_slots=1, chunk_steps=16, max_cache=256, max_gen=64)
    try:
        routes = _routes(eng)
        wav_bytes = _prompt_wav_bytes()
        pcm = b"".join(routes["/inference_zero_shot"]("bonjour", "salut", wav_bytes))
        assert len(pcm) > 0 and len(pcm) % 2 == 0

        eng.add_zero_shot_spk("salut", _prompt_wav_bytes_to_array(wav_bytes), "spk_a")
        pcm2 = b"".join(routes["/inference_sft"]("hallo", "spk_a"))
        assert len(pcm2) > 0
    finally:
        eng.close()


def _prompt_wav_bytes_to_array(data: bytes) -> np.ndarray:
    from cosyvoice2_eu_tpu.serving.http_server import _decode_wav_bytes

    return _decode_wav_bytes(data)


def test_webui_postprocess_prompt():
    """Prompt hygiene (reference webui.py:46-57): silence trimmed, peak
    normalized to 0.8, 0.2 s pad appended."""
    from cosyvoice2_eu_tpu.serving.webui import MAX_VAL, postprocess_prompt

    sr = 16000
    rng = np.random.default_rng(0)
    sig = np.concatenate([
        np.zeros(sr, np.float32),                      # 1 s leading silence
        (rng.standard_normal(sr) * 2.0).astype(np.float32),  # loud speech
        np.zeros(sr, np.float32),                      # 1 s trailing silence
    ])
    out = postprocess_prompt(sig, sr)
    # trimmed to ~1 s of speech + 0.2 s pad (frame-quantized)
    assert len(out) < 1.5 * sr
    assert abs(np.abs(out).max() - MAX_VAL) < 1e-6
    assert np.allclose(out[-int(0.2 * sr):], 0.0)
    # already-quiet audio is not boosted
    quiet = np.sin(np.linspace(0, 100, sr)).astype(np.float32) * 0.1
    out2 = postprocess_prompt(quiet, sr)
    assert np.abs(out2).max() <= 0.1 + 1e-6


def test_webui_validate_request():
    """Mode gating mirrors the reference warnings (webui.py:72-110)."""
    from cosyvoice2_eu_tpu.serving.webui import MODES, validate_request

    err = lambda ws: [w for w in ws if w.startswith("error:")]
    # sft: needs a speaker; ignores prompt inputs
    assert err(validate_request(MODES[0], False, "", "", ""))
    ws = validate_request(MODES[0], True, "x", "", "spk")
    assert not err(ws) and any("ignores" in w for w in ws)
    # 3s clone: needs prompt AND transcription
    assert err(validate_request(MODES[1], False, "", "", ""))
    assert err(validate_request(MODES[1], True, "", "", ""))
    assert not err(validate_request(MODES[1], True, "bonjour", "", ""))
    # cross-lingual: needs prompt only
    assert err(validate_request(MODES[2], False, "", "", ""))
    assert not err(validate_request(MODES[2], True, "", "", ""))
    # control: needs instruction + (prompt or speaker)
    assert err(validate_request(MODES[3], True, "", "", ""))
    assert err(validate_request(MODES[3], False, "", "speak softly", ""))
    assert not err(validate_request(MODES[3], False, "", "speak softly", "spk"))
    assert not err(validate_request(MODES[3], True, "", "speak softly", ""))
