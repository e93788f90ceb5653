"""Float-vector (embedding) column codec — training-pipeline storage.

Embedding columns (``array<float>``) dominate bytes in training-data
lakes next to text. Lightweight float compression that stays lossless:

* **ftrans** — byte-plane transposition of the flat float32 stream
  (the Blosc/HDF5 shuffle filter): exponent/sign bytes of similar
  vectors are near-constant, so the zstd wrap collapses them. Lossless.
* **fplain** — raw little-endian float32 + lengths (escape hatch).

Both carry (lengths, flat float32s), mirroring the string canonical
form, so ragged vector columns work. Framing, null bitmaps, and the
zstd wrap come from the same block layer as every other codec.

A lossy-quantized codec (fp16/int8 + scale) is the obvious next rung —
deliberately NOT implemented: the engine's invariant is bit-identical
decode (BASELINE.json north_rule).
"""

from __future__ import annotations

import numpy as np

from .primitives import pack_sections, u32, read_u32, unpack_sections
from .core import _decode_uint_vec, _encode_uint_vec


class FplainVecCodec:
    name = "fplain"

    def encode_vecs(self, lengths: np.ndarray, flat: np.ndarray) -> bytes:
        return pack_sections(
            _encode_uint_vec(lengths.astype(np.uint64)),
            np.ascontiguousarray(flat, dtype="<f4").tobytes(),
        )

    def decode_vecs(self, payload: bytes, n: int) -> tuple[np.ndarray, np.ndarray]:
        len_sec, data = unpack_sections(payload, 2)
        lengths = _decode_uint_vec(len_sec, n).astype(np.int64)
        flat = np.frombuffer(data, dtype="<f4")
        return lengths, flat


class FtransVecCodec:
    """Byte-plane transposed float32s: plane k holds byte k of every
    value — sign/exponent planes compress to near nothing under zstd
    for naturally-clustered embeddings."""

    name = "ftrans"

    def encode_vecs(self, lengths: np.ndarray, flat: np.ndarray) -> bytes:
        f = np.ascontiguousarray(flat, dtype="<f4")
        planes = np.ascontiguousarray(f.view(np.uint8).reshape(-1, 4).T)
        return pack_sections(
            _encode_uint_vec(lengths.astype(np.uint64)),
            u32(len(f)) + planes.tobytes(),
        )

    def decode_vecs(self, payload: bytes, n: int) -> tuple[np.ndarray, np.ndarray]:
        len_sec, data = unpack_sections(payload, 2)
        lengths = _decode_uint_vec(len_sec, n).astype(np.int64)
        m = read_u32(data)
        planes = np.frombuffer(data, dtype=np.uint8, offset=4).reshape(4, m)
        flat = np.ascontiguousarray(planes.T).reshape(-1).view("<f4").copy()
        return lengths, flat


VEC_CODECS = {"fplain": FplainVecCodec(), "ftrans": FtransVecCodec()}
