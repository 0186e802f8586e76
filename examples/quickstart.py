"""Interactive synthesis examples (the reference's inference_notebook.ipynb
as a runnable script)."""

import numpy as np

import cosyvoice2_eu_tpu as cosy
from cosyvoice2_eu_tpu.cli import save_wav

# 1. load (use model_dir=<converted reference checkpoints> for real audio;
#    None builds a random-weight model that exercises the full pipeline)
model = cosy.load(model_dir=None)

# with converted checkpoints you would pass a wav path; random-weight demo
# uses precomputed prompt artifacts instead:
rng = np.random.default_rng(0)
prompt = {
    "prompt_feat": (rng.standard_normal((300, 80)) * 0.5 - 4).astype(np.float32),
    "speech_tokens": rng.integers(0, 6561, 150).astype(np.int32),
    "embedding": rng.standard_normal(192).astype(np.float32),
    "prompt_text": "",
}

# 2. non-streaming cross-lingual cloning
wav, sr = model.tts("Bonjour tout le monde, ceci est un test.", prompt)
save_wav("out_nonstream.wav", wav[0], sr)
print(f"non-streaming: {wav.shape[1] / sr:.2f}s")

# 3. streaming
chunks = []
for chunk in model.stream("Hallo Welt, das ist ein Test.", prompt):
    chunks.append(chunk[0])
    print(f"  chunk: {len(chunk[0]) / sr:.2f}s")
save_wav("out_stream.wav", np.concatenate(chunks), sr)

# 4. style control (instruct2)
wav, sr = model.tts(
    "Il était une fois...", prompt,
    mode="instruct2", instruct_text="Parle d'une voix douce et lente.",
)
save_wav("out_instruct.wav", wav[0], sr)

# 5. cached speaker (spk2info)
model.add_zero_shot_spk("", prompt, "demo_speaker")
model._frontend.save_spk_info("spk2info.npz")
