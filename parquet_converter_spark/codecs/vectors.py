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

Two OPT-IN lossy rungs (training pipelines routinely trade exactness
for 2-4× space on embeddings; see the Faiss/ScaNN scalar-quantization
literature):

* **fq16** — IEEE half precision. Relative error ≤ 2^-11 per element
  over the fp16 normal range (|x| ∈ [6.1e-5, 65504]); underflow is
  graded to subnormals, overflow saturates to ±inf. 2× before zstd.
* **fq8** — per-vector symmetric int8: ``q = round(x * 127 / amax)``
  with one float32 scale per vector (``amax = max|x|``). Per-element
  absolute error ≤ amax/254 (half a quantization step). ~4× before
  zstd.

Lossy codecs are NEVER auto-selected (absent from ``ELIGIBLE``) and
are rejected by the table-encode CLI whitelist — the engine's default
invariant stays bit-identical decode (BASELINE.json north_rule). They
are reachable only through explicit opt-in
(``encode_block(..., codec="fq8")`` /
``operators.embcodec.lossy_compression_metrics``), which reports the
realized error alongside the ratio.
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


class Fq16VecCodec:
    """Half-precision downcast. Decode widens back to float32 (the
    nearest f32 to each stored f16), so roundtrip error is exactly the
    f32→f16 rounding: ≤ 2^-11 relative in the fp16 normal range."""

    name = "fq16"
    lossy = True

    def encode_vecs(self, lengths: np.ndarray, flat: np.ndarray) -> bytes:
        with np.errstate(over="ignore"):  # saturation to ±inf is the contract
            h = np.ascontiguousarray(flat, dtype="<f4").astype("<f2")
        return pack_sections(_encode_uint_vec(lengths.astype(np.uint64)), h.tobytes())

    def decode_vecs(self, payload: bytes, n: int) -> tuple[np.ndarray, np.ndarray]:
        len_sec, data = unpack_sections(payload, 2)
        lengths = _decode_uint_vec(len_sec, n).astype(np.int64)
        return lengths, np.frombuffer(data, dtype="<f2").astype(np.float32)


class Fq8VecCodec:
    """Per-vector symmetric int8 quantization: one float32 scale per
    vector (amax/127), int8 codes. NaN/±inf amax poisons only its own
    vector (scale becomes nan/inf), never neighbors — scales are
    per-vector by construction."""

    name = "fq8"
    lossy = True

    def encode_vecs(self, lengths: np.ndarray, flat: np.ndarray) -> bytes:
        f = np.ascontiguousarray(flat, dtype="<f4")
        lens = lengths.astype(np.int64)
        bounds = np.concatenate([[0], np.cumsum(lens)])
        amax = np.zeros(len(lens), dtype="<f4")
        nzmask = lens > 0
        if f.size and nzmask.any():
            # reduceat over only the non-empty segments' starts (an
            # empty vector's start can be == len(f), out of range, and
            # zero-length slices return garbage); scatter back
            starts = bounds[:-1][nzmask]
            amax[nzmask] = np.maximum.reduceat(np.abs(f), starts).astype("<f4")
        with np.errstate(divide="ignore", invalid="ignore"):
            scales = (amax / 127.0).astype("<f4")
            safe = np.where(scales > 0, scales, np.float32(1.0))
            inv = np.repeat(
                np.where(scales > 0, 1.0 / safe, 0.0).astype(np.float32), lens
            )
            q = np.nan_to_num(
                np.clip(np.rint(f * inv), -127, 127), nan=0.0, posinf=127, neginf=-127
            ).astype(np.int8)
        return pack_sections(
            _encode_uint_vec(lens.astype(np.uint64)), scales.tobytes(), q.tobytes()
        )

    def decode_vecs(self, payload: bytes, n: int) -> tuple[np.ndarray, np.ndarray]:
        len_sec, scale_sec, data = unpack_sections(payload, 3)
        lengths = _decode_uint_vec(len_sec, n).astype(np.int64)
        scales = np.frombuffer(scale_sec, dtype="<f4")
        q = np.frombuffer(data, dtype=np.int8)
        with np.errstate(invalid="ignore"):  # inf-amax vectors decode to nan
            flat = (q.astype(np.float32) * np.repeat(scales, lengths)).astype(np.float32)
        return lengths, flat


VEC_CODECS = {
    "fplain": FplainVecCodec(),
    "ftrans": FtransVecCodec(),
    "fq16": Fq16VecCodec(),
    "fq8": Fq8VecCodec(),
}

#: codecs whose decode is an approximation — opt-in only, never
#: auto-selected, rejected by bit-exact verify paths
LOSSY_VEC_CODECS = frozenset(
    name for name, c in VEC_CODECS.items() if getattr(c, "lossy", False)
)
