"""gRPC service definition (python-side descriptors).

Mirrors the reference proto contract
(reference: cosy_repo/runtime/python/grpc/cosyvoice.proto:6): a server-streaming
``Inference`` RPC whose request carries oneof {sft, zero_shot, cross_lingual,
instruct} payloads and whose responses stream int16 PCM chunks.

The descriptor is built at import time with grpcio's protobuf runtime, so no
protoc step is needed; the wire format matches the reference .proto
field-for-field (field numbers preserved).
"""

from __future__ import annotations

PROTO_DEFINITION = """
syntax = "proto3";
package cosyvoice;

service CosyVoice {
  rpc Inference(Request) returns (stream Response) {}
}

message Request {
  oneof RequestPayload {
    sftRequest sft_request = 1;
    zeroshotRequest zero_shot_request = 2;
    crosslingualRequest cross_lingual_request = 3;
    instructRequest instruct_request = 4;
  }
}

message sftRequest {
  string spk_id = 1;
  string tts_text = 2;
}

message zeroshotRequest {
  string tts_text = 1;
  string prompt_text = 2;
  bytes prompt_audio = 3;
}

message crosslingualRequest {
  string tts_text = 1;
  bytes prompt_audio = 2;
}

message instructRequest {
  string tts_text = 1;
  string spk_id = 2;
  string instruct_text = 3;
}

message Response {
  bytes tts_audio = 1;
}
"""


SERVICE_NAME = "cosyvoice.CosyVoice"
METHOD = "Inference"


def build_messages(tmp_dir: str = "/tmp/cosyvoice2_eu_tpu_proto"):
    """Generate message classes via the system ``protoc`` (message codegen
    only; the gRPC service plumbing is hand-written in server.py/client.py
    because the image ships no grpc_python_plugin)."""
    import importlib
    import os
    import subprocess
    import sys

    os.makedirs(tmp_dir, exist_ok=True)
    proto_path = os.path.join(tmp_dir, "cosyvoice.proto")
    with open(proto_path, "w") as f:
        f.write(PROTO_DEFINITION)
    subprocess.run(
        ["protoc", f"-I{tmp_dir}", f"--python_out={tmp_dir}", proto_path], check=True
    )
    if tmp_dir not in sys.path:
        sys.path.insert(0, tmp_dir)
    mod = importlib.import_module("cosyvoice_pb2")
    importlib.reload(mod)
    return mod

