"""ONNX wire-format walker vs hand-encoded protobuf bytes."""

import struct

import numpy as np

from cosyvoice2_eu_tpu.runtime.onnx_import import load_onnx


def _varint(v: int) -> bytes:
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            out += bytes([b])
            return out


def _ld(field: int, payload: bytes) -> bytes:
    return _varint((field << 3) | 2) + _varint(len(payload)) + payload


def _vi(field: int, value: int) -> bytes:
    return _varint(field << 3) + _varint(value)


def test_load_onnx_roundtrip(tmp_path):
    # TensorProto: dims=[2,3], data_type=1 (f32), name="w", raw_data
    data = np.arange(6, dtype=np.float32).reshape(2, 3)
    tensor = (
        _vi(1, 2) + _vi(1, 3) + _vi(2, 1)
        + _ld(8, b"w") + _ld(9, data.tobytes())
    )
    # int64 tensor via int64_data (packed)
    ints = _varint(5) + _varint(7)
    tensor2 = _vi(1, 2) + _vi(2, 7) + _ld(7, ints) + _ld(8, b"steps")
    # NodeProto: input x,w -> output y, op_type MatMul
    node = _ld(1, b"x") + _ld(1, b"w") + _ld(2, b"y") + _ld(4, b"MatMul")
    graph = _ld(1, node) + _ld(5, tensor) + _ld(5, tensor2)
    model = _ld(7, graph)

    path = tmp_path / "toy.onnx"
    path.write_bytes(model)
    out = load_onnx(str(path))
    np.testing.assert_array_equal(out["initializers"]["w"], data)
    np.testing.assert_array_equal(out["initializers"]["steps"], [5, 7])
    assert out["nodes"][0]["op_type"] == "MatMul"
    assert out["nodes"][0]["input"] == ["x", "w"]
