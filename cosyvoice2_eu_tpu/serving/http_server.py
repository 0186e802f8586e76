"""HTTP streaming TTS server.

Mirrors the reference FastAPI surface
(reference: cosy_repo/runtime/python/fastapi/server.py:46-80): GET/POST
``/inference_zero_shot``, ``/inference_cross_lingual``, ``/inference_sft``,
``/inference_instruct2`` streaming raw int16 PCM bytes.  Uses FastAPI when
installed; otherwise falls back to a stdlib http.server implementation with
the same routes and wire format (this image ships no fastapi/uvicorn).
"""

from __future__ import annotations

import io
import json
import logging
import wave
from typing import Optional

import numpy as np


def _pcm16(audio: np.ndarray) -> bytes:
    return (np.clip(audio, -1, 1) * 32767.0).astype(np.int16).tobytes()


def _decode_wav_bytes(data: bytes, target_sr: int = 16000) -> np.ndarray:
    from cosyvoice2_eu_tpu.frontend.frontend import resample

    with wave.open(io.BytesIO(data), "rb") as w:
        sr = w.getframerate()
        raw = w.readframes(w.getnframes())
        width = w.getsampwidth()
        ch = w.getnchannels()
    if width == 2:
        x = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
    else:
        x = np.frombuffer(raw, np.int32).astype(np.float32) / 2147483648.0
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    return resample(x, sr, target_sr)


def _routes(model):
    def inference_zero_shot(tts_text: str, prompt_text: str, prompt_wav: bytes):
        prompt = _decode_wav_bytes(prompt_wav)
        for chunk in model.stream(tts_text, prompt, prompt_text=prompt_text, mode="zero_shot"):
            yield _pcm16(chunk[0])

    def inference_cross_lingual(tts_text: str, prompt_wav: bytes):
        prompt = _decode_wav_bytes(prompt_wav)
        for chunk in model.stream(tts_text, prompt, mode="cross_lingual"):
            yield _pcm16(chunk[0])

    def inference_sft(tts_text: str, spk_id: str):
        prompt = model._frontend.get_spk(spk_id)
        for chunk in model.stream(tts_text, prompt):
            yield _pcm16(chunk[0])

    def inference_instruct2(tts_text: str, instruct_text: str, prompt_wav: bytes):
        prompt_art = model._prepare(_decode_wav_bytes(prompt_wav))
        inputs = model._frontend.frontend_instruct2(tts_text, instruct_text, prompt_art)
        for chunk in model._model.tts(inputs, stream=True):
            yield _pcm16(chunk)

    return {
        "/inference_zero_shot": inference_zero_shot,
        "/inference_cross_lingual": inference_cross_lingual,
        "/inference_sft": inference_sft,
        "/inference_instruct2": inference_instruct2,
    }


def build_fastapi_app(model):
    from fastapi import FastAPI, Form, UploadFile
    from fastapi.responses import StreamingResponse

    app = FastAPI()
    routes = _routes(model)

    @app.post("/inference_zero_shot")
    async def zero_shot(tts_text: str = Form(), prompt_text: str = Form(),
                        prompt_wav: UploadFile = None):
        data = await prompt_wav.read()
        return StreamingResponse(routes["/inference_zero_shot"](tts_text, prompt_text, data))

    @app.post("/inference_cross_lingual")
    async def cross_lingual(tts_text: str = Form(), prompt_wav: UploadFile = None):
        data = await prompt_wav.read()
        return StreamingResponse(routes["/inference_cross_lingual"](tts_text, data))

    @app.get("/inference_sft")
    @app.post("/inference_sft")
    async def sft(tts_text: str = Form(), spk_id: str = Form()):
        return StreamingResponse(routes["/inference_sft"](tts_text, spk_id))

    @app.post("/inference_instruct2")
    async def instruct2(tts_text: str = Form(), instruct_text: str = Form(),
                        prompt_wav: UploadFile = None):
        data = await prompt_wav.read()
        return StreamingResponse(
            routes["/inference_instruct2"](tts_text, instruct_text, data)
        )

    return app


def serve_stdlib(model, host: str = "0.0.0.0", port: int = 50000):
    """Fallback HTTP server: JSON body {tts_text, prompt_text?, instruct_text?,
    spk_id?, prompt_wav_b64?}; chunked int16 PCM response."""
    import base64
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    routes = _routes(model)

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            if self.path not in routes:
                self.send_error(404)
                return
            length = int(self.headers.get("Content-Length", 0))
            body = json.loads(self.rfile.read(length) or b"{}")
            wav = base64.b64decode(body.get("prompt_wav_b64", "")) or None
            try:
                if self.path == "/inference_zero_shot":
                    gen = routes[self.path](body["tts_text"], body.get("prompt_text", ""), wav)
                elif self.path == "/inference_cross_lingual":
                    gen = routes[self.path](body["tts_text"], wav)
                elif self.path == "/inference_sft":
                    gen = routes[self.path](body["tts_text"], body["spk_id"])
                else:
                    gen = routes[self.path](body["tts_text"], body.get("instruct_text", ""), wav)
                self.send_response(200)
                self.send_header("Content-Type", "application/octet-stream")
                self.send_header("Transfer-Encoding", "chunked")
                self.end_headers()
                for chunk in gen:
                    self.wfile.write(f"{len(chunk):x}\r\n".encode())
                    self.wfile.write(chunk + b"\r\n")
                self.wfile.write(b"0\r\n\r\n")
            except Exception as e:  # pragma: no cover
                logging.exception("inference failed")
                self.send_error(500, str(e))

        def log_message(self, *args):
            pass

    server = ThreadingHTTPServer((host, port), Handler)
    logging.info("HTTP server listening on %s:%d", host, port)
    return server


def main():
    import argparse

    import cosyvoice2_eu_tpu as cosy

    parser = argparse.ArgumentParser()
    parser.add_argument("--port", type=int, default=50000)
    parser.add_argument("--model-dir", type=str, default=None)
    parser.add_argument(
        "--engine-slots", type=int, default=0,
        help="serve through the continuous-batching engine with N LM slots "
        "(0 = per-request sequential, the reference's behavior)",
    )
    args = parser.parse_args()
    model = cosy.load(model_dir=args.model_dir)
    if args.engine_slots > 0:
        from cosyvoice2_eu_tpu.serving.engine import EngineAPI

        model = EngineAPI(model, n_slots=args.engine_slots)
    try:
        import uvicorn

        uvicorn.run(build_fastapi_app(model), host="0.0.0.0", port=args.port)
    except ImportError:
        serve_stdlib(model, port=args.port).serve_forever()


if __name__ == "__main__":
    main()
