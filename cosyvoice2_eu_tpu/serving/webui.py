"""Gradio web UI (mode radio: zero-shot / cross-lingual / instruct).

Mirrors the reference webui (reference: cosy_repo/webui.py:138,
webui_french.py): prompt upload or mic recording, seed control, streaming
playback.  Requires gradio (not shipped in the build image; install the
``serve`` extra).
"""

from __future__ import annotations

import numpy as np


def build_demo(model):
    import gradio as gr

    modes = ["zero-shot clone", "cross-lingual clone", "natural language control"]

    def generate(mode, tts_text, prompt_wav, prompt_text, instruct_text, seed, stream, speed):
        import jax

        model._model._rng = jax.random.key(int(seed))
        sr = model.sample_rate
        if prompt_wav is None:
            raise gr.Error("please provide a prompt recording")
        in_sr, data = prompt_wav
        wav = data.astype(np.float32) / 32768.0 if data.dtype == np.int16 else data
        from cosyvoice2_eu_tpu.frontend.frontend import resample

        wav16 = resample(wav.mean(axis=1) if wav.ndim > 1 else wav, in_sr, 16000)
        if mode == modes[0]:
            gen = model.stream(tts_text, wav16, prompt_text=prompt_text, mode="zero_shot",
                               speed=speed)
        elif mode == modes[1]:
            gen = model.stream(tts_text, wav16, mode="cross_lingual", speed=speed)
        else:
            art = model._prepare(wav16)
            inputs = model._frontend.frontend_instruct2(tts_text, instruct_text, art)
            gen = (c[None] for c in model._model.tts(inputs, stream=True, speed=speed))
        if stream:
            for chunk in gen:
                yield sr, (np.clip(chunk[0], -1, 1) * 32767).astype(np.int16)
        else:
            audio = np.concatenate([c[0] for c in gen])
            yield sr, (np.clip(audio, -1, 1) * 32767).astype(np.int16)

    with gr.Blocks(title="CosyVoice2-EU TPU") as demo:
        gr.Markdown("## CosyVoice2-EU — TPU-native zero-shot voice cloning (FR/DE)")
        mode = gr.Radio(modes, value=modes[1], label="inference mode")
        tts_text = gr.Textbox(label="text to synthesize", value="Bonjour tout le monde !")
        prompt_wav = gr.Audio(sources=["upload", "microphone"], type="numpy",
                              label="prompt audio (>= 16 kHz)")
        prompt_text = gr.Textbox(label="prompt transcription (zero-shot mode)")
        instruct_text = gr.Textbox(label="instruction (control mode)")
        seed = gr.Number(value=0, label="random seed", precision=0)
        stream = gr.Checkbox(value=True, label="streaming playback")
        speed = gr.Slider(0.5, 2.0, value=1.0, label="speed")
        audio_out = gr.Audio(label="synthesized audio", streaming=True, autoplay=True)
        btn = gr.Button("generate")
        btn.click(
            generate,
            inputs=[mode, tts_text, prompt_wav, prompt_text, instruct_text, seed, stream, speed],
            outputs=[audio_out],
        )
    return demo


def main():
    import argparse

    import cosyvoice2_eu_tpu as cosy

    parser = argparse.ArgumentParser()
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--model-dir", type=str, default=None)
    args = parser.parse_args()
    model = cosy.load(model_dir=args.model_dir)
    build_demo(model).queue().launch(server_name="0.0.0.0", server_port=args.port)


if __name__ == "__main__":
    main()
