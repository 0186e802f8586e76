"""Minimal ONNX protobuf writer for tests.

Builds real ONNX model bytes (the wire format runtime/onnx_import.py parses)
so converter/executor tests can run against synthetic graphs shaped like
torch.onnx.export output, without the onnx package.
"""

from __future__ import annotations

import struct

import numpy as np

_NP_TO_ONNX = {
    np.dtype(np.float32): 1, np.dtype(np.uint8): 2, np.dtype(np.int8): 3,
    np.dtype(np.int32): 6, np.dtype(np.int64): 7, np.dtype(np.bool_): 9,
    np.dtype(np.float16): 10, np.dtype(np.float64): 11,
}


def _varint(v: int) -> bytes:
    if v < 0:
        v += 1 << 64
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _key(field: int, wtype: int) -> bytes:
    return _varint((field << 3) | wtype)


def _len_field(field: int, data: bytes) -> bytes:
    return _key(field, 2) + _varint(len(data)) + data


def _int_field(field: int, v: int) -> bytes:
    return _key(field, 0) + _varint(v)


def _float_field(field: int, v: float) -> bytes:
    return _key(field, 5) + struct.pack("<f", v)


def tensor_proto(name: str, arr: np.ndarray) -> bytes:
    arr = np.asarray(arr)
    out = b""
    for d in arr.shape:
        out += _int_field(1, d)
    out += _int_field(2, _NP_TO_ONNX[arr.dtype])
    out += _len_field(8, name.encode())
    out += _len_field(9, arr.tobytes())
    return out


def _attr(name: str, value) -> bytes:
    # Real proto3 serializers (torch.onnx export) omit zero-valued scalar
    # payload fields and rely on AttributeProto.type alone — mimic that so
    # the importer's zero-default path is what tests actually exercise.
    out = _len_field(1, name.encode())
    if isinstance(value, bool):
        out += (_int_field(3, int(value)) if value else b"") + _int_field(20, 2)
    elif isinstance(value, int):
        out += (_int_field(3, value) if value != 0 else b"") + _int_field(20, 2)
    elif isinstance(value, float):
        out += (_float_field(2, value) if value != 0.0 else b"") + _int_field(20, 1)
    elif isinstance(value, (bytes, str)):
        data = value.encode() if isinstance(value, str) else value
        out += (_len_field(4, data) if data else b"") + _int_field(20, 3)
    elif isinstance(value, np.ndarray):
        out += _len_field(5, tensor_proto("", value)) + _int_field(20, 4)
    elif isinstance(value, (list, tuple)) and all(isinstance(v, int) for v in value):
        for v in value:
            out += _int_field(8, v)
        out += _int_field(20, 7)
    elif isinstance(value, (list, tuple)):
        for v in value:
            out += _float_field(7, float(v))
        out += _int_field(20, 6)
    else:
        raise TypeError(f"unsupported attr {name}={value!r}")
    return out


def node_proto(op_type: str, inputs, outputs, name: str = "", **attrs) -> bytes:
    out = b""
    for i in inputs:
        out += _len_field(1, i.encode())
    for o in outputs:
        out += _len_field(2, o.encode())
    out += _len_field(3, (name or f"{op_type}_{outputs[0]}").encode())
    out += _len_field(4, op_type.encode())
    for k, v in attrs.items():
        out += _len_field(5, _attr(k, v))
    return out


def _value_info(name: str, elem_type: int = 0) -> bytes:
    out = _len_field(1, name.encode())
    if elem_type:
        # ValueInfoProto.type(2) -> TypeProto.tensor_type(1) -> elem_type(1)
        tensor = _int_field(1, elem_type)
        out += _len_field(2, _len_field(1, tensor))
    return out


def model_bytes(nodes: list[bytes], initializers: dict, inputs, outputs,
                input_types: dict | None = None) -> bytes:
    """input_types: name -> ONNX TensorProto.DataType for graph inputs
    (real exporters always emit this; default float32 like the speech
    frontends' mel/fbank feeds)."""
    g = b""
    for n in nodes:
        g += _len_field(1, n)
    g += _len_field(2, b"synthetic")
    for name, arr in initializers.items():
        g += _len_field(5, tensor_proto(name, np.asarray(arr)))
    for i in inputs:
        g += _len_field(11, _value_info(i, (input_types or {}).get(i, 1)))
    for o in outputs:
        g += _len_field(12, _value_info(o))
    m = _int_field(1, 8)  # ir_version
    m += _len_field(7, g)
    m += _len_field(8, _int_field(2, 17))  # opset 17
    return m


class GraphBuilder:
    """Convenience builder: accumulates nodes/initializers, writes a file."""

    def __init__(self):
        self.nodes: list[bytes] = []
        self.inits: dict[str, np.ndarray] = {}
        self._n = 0

    def fresh(self, hint: str = "t") -> str:
        self._n += 1
        return f"{hint}_{self._n}"

    def init(self, arr, hint: str = "w") -> str:
        name = self.fresh(hint)
        self.inits[name] = np.asarray(arr)
        return name

    def add(self, op: str, inputs, n_out: int = 1, **attrs):
        outs = [self.fresh(op.lower()) for _ in range(n_out)]
        self.nodes.append(node_proto(op, inputs, outs, **attrs))
        return outs[0] if n_out == 1 else outs

    def save(self, path: str, inputs, outputs,
             input_types: dict | None = None) -> str:
        with open(path, "wb") as f:
            f.write(model_bytes(self.nodes, self.inits, inputs, outputs,
                                input_types))
        return path
