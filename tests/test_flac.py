"""Native FLAC decoder tests (native/audio_io.cpp decode_flac).

No FLAC assets or encoder library exist in this image, so these tests
include a minimal spec-faithful FLAC ENCODER (RFC 9639: stream header,
STREAMINFO, frame headers with CRC-8/CRC-16, UTF-8 frame numbers,
CONSTANT/VERBATIM/FIXED/LPC subframes, rice-coded residuals incl. the raw
escape, left/side and mid/side stereo) and assert exact roundtrips through
the native decoder. Real-corpus validation additionally joins
tools/validate_real.py once LibriSpeech assets exist.
"""

import os
import numpy as np
import pytest

from openai_whisper_coreml_tpu.utils import audio_io


def _native():
    lib = audio_io._find_native_lib()
    if lib is None:
        pytest.skip("native lib not built")
    return lib


# -- minimal FLAC encoder ----------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.bytes.append(self.acc)
                self.acc = 0
                self.nbits = 0

    def put_signed(self, value: int, n: int) -> None:
        self.put(value & ((1 << n) - 1), n)

    def put_unary(self, q: int) -> None:
        for _ in range(q):
            self.put(0, 1)
        self.put(1, 1)

    def align(self) -> None:
        while self.nbits:
            self.put(0, 1)


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


def _streaminfo(sample_rate: int, channels: int, bps: int,
                total: int, block_size: int) -> bytes:
    bw = _BitWriter()
    bw.put(block_size, 16)
    bw.put(block_size, 16)
    bw.put(0, 24)
    bw.put(0, 24)
    bw.put(sample_rate, 20)
    bw.put(channels - 1, 3)
    bw.put(bps - 1, 5)
    bw.put(total, 36)
    body = bytes(bw.bytes) + b"\x00" * 16  # md5 unset
    assert len(body) == 34
    return b"\x80" + len(body).to_bytes(3, "big") + body


def _rice_residual(bw: _BitWriter, residual, param: int) -> None:
    bw.put(0, 2)   # method: rice, 4-bit params
    bw.put(0, 4)   # partition order 0
    bw.put(param, 4)
    for v in residual:
        # zigzag: positive v -> 2v, negative v -> -2v - 1
        u = (v << 1) if v >= 0 else (-(v << 1) - 1)
        bw.put_unary(u >> param)
        if param:
            bw.put(u & ((1 << param) - 1), param)


def _subframe_verbatim(bw: _BitWriter, samples, bps: int) -> None:
    bw.put(0, 1)
    bw.put(0b000001, 6)
    bw.put(0, 1)
    for s in samples:
        bw.put_signed(int(s), bps)


def _subframe_constant(bw: _BitWriter, value: int, bps: int) -> None:
    bw.put(0, 1)
    bw.put(0b000000, 6)
    bw.put(0, 1)
    bw.put_signed(value, bps)


def _subframe_fixed2(bw: _BitWriter, samples, bps: int, param: int) -> None:
    bw.put(0, 1)
    bw.put(0b001010, 6)  # FIXED, order 2
    bw.put(0, 1)
    bw.put_signed(int(samples[0]), bps)
    bw.put_signed(int(samples[1]), bps)
    res = [int(samples[i]) - 2 * int(samples[i - 1]) + int(samples[i - 2])
           for i in range(2, len(samples))]
    _rice_residual(bw, res, param)


def _frame(frame_idx: int, block_size: int, channels,
           subframe_writer) -> bytes:
    """channels: list of per-channel (writer_fn) callables; blocksize via
    the 16-bit 'blocksize - 1' header code (0b0111)."""
    hdr = _BitWriter()
    hdr.put(0b11111111111110, 14)
    hdr.put(0, 1)  # reserved
    hdr.put(0, 1)  # fixed blocking
    hdr.put(0b0111, 4)  # blocksize: 16-bit field follows
    hdr.put(0b0000, 4)  # sample rate: from STREAMINFO
    hdr.put(channels, 4)  # channel assignment code
    hdr.put(0b100, 3)  # 16 bps
    hdr.put(0, 1)
    assert frame_idx < 0x80
    hdr.put(frame_idx, 8)  # UTF-8 (single byte)
    hdr.put(block_size - 1, 16)
    header_bytes = bytes(hdr.bytes)
    assert hdr.nbits == 0
    header_bytes += bytes([_crc8(header_bytes)])

    body = _BitWriter()
    subframe_writer(body)
    body.align()
    frame = header_bytes + bytes(body.bytes)
    return frame + _crc16(frame).to_bytes(2, "big")


def _encode_flac_mono(samples: np.ndarray, sample_rate: int,
                      block_size: int, kind: str) -> bytes:
    out = b"fLaC" + _streaminfo(sample_rate, 1, 16, len(samples), block_size)
    idx = 0
    frame_idx = 0
    while idx < len(samples):
        blk = samples[idx : idx + block_size]
        bs = len(blk)

        def write(bw, blk=blk):
            if kind == "verbatim":
                _subframe_verbatim(bw, blk, 16)
            elif kind == "constant":
                _subframe_constant(bw, int(blk[0]), 16)
            else:
                _subframe_fixed2(bw, blk, 16, param=6)

        out += _frame(frame_idx, bs, 0b0000, write)
        idx += bs
        frame_idx += 1
    return out


def _decode(path: str, rate: int = 16_000) -> np.ndarray:
    return audio_io.load_audio(path, sample_rate=rate)


# -- tests --------------------------------------------------------------------

def test_flac_verbatim_roundtrip(tmp_path, rng):
    _native()
    pcm = (rng.integers(-32768, 32768, 5000)).astype(np.int64)
    raw = _encode_flac_mono(pcm, 16_000, 1024, "verbatim")
    p = tmp_path / "v.flac"
    p.write_bytes(raw)
    out = _decode(str(p))
    assert out.shape == (5000,)
    np.testing.assert_allclose(out, pcm / 32768.0, atol=1e-7)


def test_flac_constant_frames(tmp_path):
    _native()
    pcm = np.full(2048, -1234, np.int64)
    raw = _encode_flac_mono(pcm, 16_000, 1024, "constant")
    p = tmp_path / "c.flac"
    p.write_bytes(raw)
    out = _decode(str(p))
    np.testing.assert_allclose(out, pcm / 32768.0, atol=1e-7)


def test_flac_fixed_order2_rice(tmp_path):
    _native()
    # smooth signal so order-2 residuals are small (exercises rice quotients)
    t = np.arange(3000)
    pcm = (12000 * np.sin(2 * np.pi * t / 180)).astype(np.int64)
    raw = _encode_flac_mono(pcm, 16_000, 1024, "fixed2")
    p = tmp_path / "f.flac"
    p.write_bytes(raw)
    out = _decode(str(p))
    assert out.shape == (3000,)
    np.testing.assert_allclose(out, pcm / 32768.0, atol=1e-7)


def test_flac_left_side_stereo(tmp_path, rng):
    _native()
    n, bs = 2048, 1024
    left = rng.integers(-20000, 20000, n).astype(np.int64)
    right = rng.integers(-20000, 20000, n).astype(np.int64)
    side = left - right  # needs 17 bits

    out = b"fLaC" + _streaminfo(16_000, 2, 16, n, bs)
    for frame_idx, start in enumerate(range(0, n, bs)):
        l_blk = left[start : start + bs]
        s_blk = side[start : start + bs]

        def write(bw, l_blk=l_blk, s_blk=s_blk):
            _subframe_verbatim(bw, l_blk, 16)
            _subframe_verbatim(bw, s_blk, 17)  # side carries the extra bit

        out += _frame(frame_idx, len(l_blk), 0b1000, write)  # left/side
    p = tmp_path / "s.flac"
    p.write_bytes(out)
    dec = _decode(str(p))
    expect = (left + right) / 2.0 / 32768.0  # mono mixdown
    np.testing.assert_allclose(dec, expect, atol=1e-7)


def test_flac_resamples(tmp_path, rng):
    _native()
    pcm = (rng.integers(-32768, 32768, 4800)).astype(np.int64)
    raw = _encode_flac_mono(pcm, 48_000, 1024, "verbatim")
    p = tmp_path / "r.flac"
    p.write_bytes(raw)
    out = _decode(str(p), rate=16_000)
    assert abs(len(out) - 1600) <= 2  # 48k -> 16k


def test_flac_batch_loader(tmp_path, rng):
    lib = _native()
    if not hasattr(lib, "wa_load_batch"):
        pytest.skip("batch loader unavailable")
    paths = []
    for i in range(4):
        pcm = rng.integers(-32768, 32768, 2000 + i).astype(np.int64)
        raw = _encode_flac_mono(pcm, 16_000, 512, "verbatim")
        p = tmp_path / f"b{i}.flac"
        p.write_bytes(raw)
        paths.append(str(p))
    batch = audio_io.load_audio_batch(paths)
    for i, arr in enumerate(batch):
        assert arr.shape == (2000 + i,)


def _subframe_lpc2(bw: _BitWriter, samples, bps: int, param: int) -> None:
    """LPC order 2 with fixed coefficients [3, -1], shift 1."""
    coefs, shift, prec = [3, -1], 1, 4
    bw.put(0, 1)
    bw.put(0b100001, 6)  # LPC, order = (0b00001) + 1 = 2
    bw.put(0, 1)
    bw.put_signed(int(samples[0]), bps)
    bw.put_signed(int(samples[1]), bps)
    bw.put(prec - 1, 4)
    bw.put_signed(shift, 5)
    for c in coefs:
        bw.put_signed(c, prec)
    res = []
    for i in range(2, len(samples)):
        pred = (coefs[0] * int(samples[i - 1])
                + coefs[1] * int(samples[i - 2])) >> shift
        res.append(int(samples[i]) - pred)
    _rice_residual(bw, res, param)


def _rice_escape_residual(bw: _BitWriter, residual, nbits: int) -> None:
    bw.put(0, 2)
    bw.put(0, 4)  # partition order 0
    bw.put(0xF, 4)  # escape
    bw.put(nbits, 5)
    for v in residual:
        bw.put_signed(v, nbits)


def test_flac_lpc_subframe(tmp_path):
    _native()
    t = np.arange(2500)
    pcm = (9000 * np.sin(2 * np.pi * t / 97)
           + 2000 * np.cos(2 * np.pi * t / 13)).astype(np.int64)
    bs = 1024
    out = b"fLaC" + _streaminfo(16_000, 1, 16, len(pcm), bs)
    for frame_idx, start in enumerate(range(0, len(pcm), bs)):
        blk = pcm[start : start + bs]

        def write(bw, blk=blk):
            _subframe_lpc2(bw, blk, 16, param=8)

        out += _frame(frame_idx, len(blk), 0b0000, write)
    p = tmp_path / "lpc.flac"
    p.write_bytes(out)
    dec = _decode(str(p))
    np.testing.assert_allclose(dec, pcm / 32768.0, atol=1e-7)


def test_flac_rice_escape_partition(tmp_path, rng):
    _native()
    pcm = rng.integers(-30000, 30000, 1024).astype(np.int64)
    bs = 1024
    out = b"fLaC" + _streaminfo(16_000, 1, 16, len(pcm), bs)

    def write(bw):
        # FIXED order 0: residual == the samples, stored as 17-bit raw via
        # the escape code (16-bit signed values need 17 bits after zigzag
        # headroom is irrelevant in escape mode — raw two's complement)
        bw.put(0, 1)
        bw.put(0b001000, 6)  # FIXED order 0
        bw.put(0, 1)
        _rice_escape_residual(bw, [int(v) for v in pcm], 17)

    out += _frame(0, bs, 0b0000, write)
    p = tmp_path / "esc.flac"
    p.write_bytes(out)
    dec = _decode(str(p))
    np.testing.assert_allclose(dec, pcm / 32768.0, atol=1e-7)


def test_flac_mid_side_stereo(tmp_path, rng):
    _native()
    n = bs = 1024
    left = rng.integers(-20000, 20000, n).astype(np.int64)
    right = rng.integers(-20000, 20000, n).astype(np.int64)
    mid = (left + right) >> 1
    side = left - right

    out = b"fLaC" + _streaminfo(16_000, 2, 16, n, bs)

    def write(bw):
        _subframe_verbatim(bw, mid, 16)
        _subframe_verbatim(bw, side, 17)

    out += _frame(0, bs, 0b1010, write)  # mid/side
    p = tmp_path / "ms.flac"
    p.write_bytes(out)
    dec = _decode(str(p))
    expect = (left + right) / 2.0 / 32768.0
    np.testing.assert_allclose(dec, expect, atol=1e-7)


def test_flac_partition_order_underflow_rejected(tmp_path):
    """A frame whose partition length <= predictor order must be REJECTED.

    Regression (advisor, round 2): with partition order >0 the first
    partition's sample count `part_len - order` underflowed uint32; combined
    with a zero-bit escape partition that consumes no input, the residual
    loop would write ~4 billion zeros past the block-sized buffer. RFC 9639
    requires (block_size >> po) > predictor_order.
    """
    _native()
    bs = 4
    out = b"fLaC" + _streaminfo(16_000, 1, 16, bs, bs)

    def write(bw):
        bw.put(0, 1)
        bw.put(0b001010, 6)  # FIXED, order 2
        bw.put(0, 1)
        bw.put_signed(100, 16)  # warmup x2
        bw.put_signed(101, 16)
        bw.put(0, 2)   # residual method: rice 4-bit
        bw.put(2, 4)   # partition order 2 -> part_len = 1 < order = 2
        for _ in range(4):
            bw.put(0xF, 4)  # escape
            bw.put(0, 5)    # nbits=0: consumes nothing per sample
    out += _frame(0, bs, 0b0000, write)
    p = tmp_path / "underflow.flac"
    p.write_bytes(out)
    with pytest.raises(ValueError, match="native FLAC decode failed"):
        _decode(str(p))


def test_flac_huge_total_samples_header(tmp_path):
    """A STREAMINFO claiming 2^36-1 total samples must not pre-allocate
    256 GB (advisor low: clamp the reserve); the actual frames decode fine."""
    _native()
    pcm = np.arange(-500, 500, dtype=np.int64)
    bs = len(pcm)
    out = b"fLaC" + _streaminfo(16_000, 1, 16, (1 << 36) - 1, bs)

    def write(bw):
        _subframe_verbatim(bw, pcm, 16)

    out += _frame(0, bs, 0b0000, write)
    p = tmp_path / "huge_header.flac"
    p.write_bytes(out)
    dec = _decode(str(p))
    np.testing.assert_allclose(dec, pcm / 32768.0, atol=1e-7)


def test_flac_mutation_fuzz_no_crash(tmp_path, rng):
    """Byte-mutation fuzz: mutated/truncated FLAC files may be rejected but
    must never crash the process (the decoder runs in a SUBPROCESS so a
    segfault/abort in native code fails this test instead of killing
    pytest). Guards the class of bugs behind the round-2 advisor findings
    (partition-order underflow, unclamped STREAMINFO reserve)."""
    _native()
    pcm = (rng.integers(-32768, 32768, 4096)).astype(np.int64)
    seeds = {
        "verbatim": _encode_flac_mono(pcm, 16_000, 1024, "verbatim"),
        "fixed2": _encode_flac_mono(pcm, 16_000, 1024, "fixed2"),
    }
    paths = []
    n_per_seed = 40
    for name, raw in seeds.items():
        raw = bytearray(raw)
        for i in range(n_per_seed):
            mutated = bytearray(raw)
            for _ in range(int(rng.integers(1, 8))):
                pos = int(rng.integers(0, len(mutated)))
                mutated[pos] = int(rng.integers(0, 256))
            if i % 5 == 0:  # also truncate sometimes
                mutated = mutated[: int(rng.integers(8, len(mutated)))]
            p = tmp_path / f"fuzz_{name}_{i}.flac"
            p.write_bytes(bytes(mutated))
            paths.append(str(p))

    code = (
        "import sys\n"
        "from openai_whisper_coreml_tpu.utils.audio_io import load_audio\n"
        "ok = rej = 0\n"
        "for p in sys.argv[1:]:\n"
        "    try:\n"
        "        load_audio(p)\n"
        "        ok += 1\n"
        "    except Exception:\n"
        "        rej += 1\n"
        "print(f'fuzz done ok={ok} rejected={rej}')\n"
    )
    import subprocess
    import sys

    proc = subprocess.run([sys.executable, "-c", code, *paths],
                          capture_output=True, text=True, timeout=600,
                          cwd=os.path.dirname(os.path.dirname(
                              os.path.abspath(__file__))))
    assert proc.returncode == 0, (
        f"decoder crashed (rc={proc.returncode}):\n{proc.stderr[-2000:]}")
    assert "fuzz done" in proc.stdout
