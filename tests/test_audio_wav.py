"""Real RIFF/WAV plumbing: roundtrip, chunk walking, malformed input."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from smart_city_data_pipeline_spark.operators.multimodal import (
    AUDIO_SR,
    _wav_params,
    decode_wav_pcm16,
    encode_wav_pcm16,
)


def test_roundtrip():
    s = np.array([0, 1000, -1000, 32767, -32768, 7], dtype="<i2")
    rate, got = decode_wav_pcm16(encode_wav_pcm16(s, 44100))
    assert rate == 44100
    assert np.array_equal(got, s)


def test_unknown_chunks_and_odd_padding_are_skipped():
    """A LIST metadata chunk (odd length → pad byte) before data must
    be walked over, like any real-world WAV."""
    s = np.arange(9, dtype="<i2")
    base = encode_wav_pcm16(s)
    # splice an odd-length junk chunk right after 'WAVE'
    junk = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # pad
    body = base[12:]
    patched = b"RIFF" + struct.pack("<I", 4 + len(junk) + len(body)) + b"WAVE" + junk + body
    rate, got = decode_wav_pcm16(patched)
    assert rate == AUDIO_SR and np.array_equal(got, s)


@pytest.mark.parametrize(
    "mutate",
    [
        lambda b: b[:8],  # truncated header
        lambda b: b"JUNK" + b[4:],  # wrong magic
        lambda b: b[:30],  # truncated mid-chunk
        lambda b: b.replace(b"data", b"nope"),  # missing data chunk
        # stereo misdeclared in fmt
        lambda b: b[:22] + struct.pack("<H", 2) + b[24:],
        # declared RIFF size larger than the file
        lambda b: b[:4] + struct.pack("<I", len(b) + 100) + b[8:],
    ],
)
def test_malformed_rejected(mutate):
    buf = mutate(encode_wav_pcm16(np.arange(16, dtype="<i2")))
    with pytest.raises(ValueError):
        decode_wav_pcm16(buf)


def test_features_match_closed_form():
    """Decoded-signal features equal the oracle's arithmetic closed
    forms for a spread of clip parameters."""
    for cid in range(40):
        n, a, p = _wav_params(cid)
        h, b = p // 2, a // 2
        i = np.arange(n)
        s = np.where(i % p < h, a, -b).astype("<i2")
        rate, got = decode_wav_pcm16(encode_wav_pcm16(s))
        g = got.astype(np.int64)
        n_hi = (n // p) * h + min(n % p, h)
        assert g.size == n
        assert int(g.max()) == a and int(g.min()) == -b
        assert int(g.sum()) == n_hi * a - (n - n_hi) * b
        assert int((g * g).sum()) == n_hi * a * a + (n - n_hi) * b * b
        assert int(np.count_nonzero(g[1:] * g[:-1] < 0)) == (n - 1) // h
