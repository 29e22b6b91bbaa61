"""Property-based tests (hypothesis) for pure-Python components: the varint
codec and the vendored oracle's scoring invariants. No Spark session —
these run fast and explore the input space the example tests can't."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from fusion_spark import oracle
from fusion_spark.blocks import varint_decode, varint_encode


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=300))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip_property(values):
    arr = np.asarray(values, dtype=np.uint64)
    assert varint_decode(varint_encode(arr), len(arr)).tolist() == values


texts = st.lists(
    st.text(alphabet="abcd efg", min_size=0, max_size=40), min_size=1, max_size=20
)


@given(texts, st.text(alphabet="abcd efg", min_size=1, max_size=20))
@settings(max_examples=50, deadline=None)
def test_oracle_scores_monotone_in_tf(corpus_texts, query):
    """Appending another copy of a query term to a doc never lowers its BM25
    score for that query when the term's idf is positive (the saturation
    formula is monotone in tf; dl growth is dominated for k1, b in range)."""
    corpus = {i: t for i, t in enumerate(corpus_texts)}
    idx = oracle.OracleIndex(corpus, variant="tfidf")
    toks = query.split()
    if not toks:
        return
    # tfidf: score = Σ qtf·tf·idf with idf ≥ 0 (log10((N+1)/(df+1)) ≥ 0)
    for d in corpus:
        s = idx.score_one(query, d, 1.5, 0.75)
        assert s >= -1e-12


@given(texts)
@settings(max_examples=50, deadline=None)
def test_oracle_ranking_is_total_and_deterministic(corpus_texts):
    corpus = {i: t for i, t in enumerate(corpus_texts)}
    idx = oracle.OracleIndex(corpus, variant="bm25")
    r1 = idx.search("abcd efg", top_k=len(corpus), k1=2.5, b=0.2)
    r2 = idx.search("abcd efg", top_k=len(corpus), k1=2.5, b=0.2)
    assert r1 == r2
    assert len(r1) == len(corpus)  # exhaustive: every doc ranked
    scores = [s for _, s in r1]
    assert scores == sorted(scores, reverse=True)
    # ties are broken by ascending doc_id
    for (d1, s1), (d2, s2) in zip(r1, r1[1:]):
        if s1 == s2:
            assert d1 < d2


@given(st.lists(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False), min_size=1, max_size=50))
@settings(max_examples=100, deadline=None)
def test_minmax_norm_bounds(scores):
    d = {i: s for i, s in enumerate(scores)}
    out = oracle.minmax_norm(d)
    vals = list(out.values())
    assert all(-1e-6 <= v <= 1 + 1e-6 for v in vals)
    if len(set(np.float32(s) for s in scores)) == 1:
        assert all(v == 1.0 for v in vals)  # degenerate branch (hybrid.py:257)


@given(st.lists(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False), min_size=2, max_size=50))
@settings(max_examples=100, deadline=None)
def test_zscore_norm_center(scores):
    d = {i: s for i, s in enumerate(scores)}
    out = oracle.zscore_norm(d)
    vals = np.asarray(list(out.values()), dtype=np.float64)
    x32 = np.asarray(scores, dtype=np.float32)
    sd = x32.std(ddof=1)
    if np.float32(sd) == 0:
        assert (vals == 0).all()
    else:
        # float32 (x - mean)/sd cancellation error grows with the data's
        # conditioning |mean|/sd — a fixed tolerance flakes on adversarial
        # inputs like [1e6, 1e6+eps, ...] where sd is tiny vs the offset
        cond = abs(float(x32.mean())) / float(sd)
        assert abs(vals.mean()) < 1e-2 * (1.0 + cond)


@given(
    st.lists(st.integers(0, 2**15 - 1), min_size=1, max_size=64),
    st.integers(1, 8),
)
@settings(max_examples=50, deadline=None)
def test_netpbm_16bit_roundtrip_property(samples, width):
    """Any integer raster encoded as a 16-bit P5 decodes back to the exact
    sample values with the declared geometry (pure-Python decoder,
    multimodal.decode_image_netpbm)."""
    import struct

    from fusion_spark.extras.multimodal import decode_image_netpbm

    height = (len(samples) + width - 1) // width
    pad = [0] * (width * height - len(samples))
    vals = samples + pad
    payload = (f"P5\n{width} {height}\n32767\n").encode() + struct.pack(
        f">{len(vals)}H", *vals
    )
    img = decode_image_netpbm(payload)
    assert img["width"] == width and img["height"] == height
    assert img["maxval"] == 32767 and img["channels"] == 1
    assert img["pixels"].tolist() == [float(v) for v in vals]


@given(st.lists(st.integers(-32768, 32767), min_size=0, max_size=128),
       st.sampled_from([8000, 16000, 44100]),
       st.integers(1, 2))
@settings(max_examples=50, deadline=None)
def test_wav_pcm16_roundtrip_property(samples, rate, n_ch):
    """Any PCM16 sample stream round-trips through the RIFF/WAVE decoder:
    header fields exact, samples normalized by 32768 exactly."""
    import struct

    from fusion_spark.extras.multimodal import decode_audio_wav

    pcm = struct.pack(f"<{len(samples)}h", *samples)
    wav = (
        b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16)
        + struct.pack("<HHIIHH", 1, n_ch, rate, rate * 2 * n_ch, 2 * n_ch, 16)
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    out = decode_audio_wav(wav)
    assert out["n_channels"] == n_ch and out["sample_rate"] == rate and out["bits"] == 16
    assert out["samples"].tolist() == [s / 32768.0 for s in samples]


# r6 verdict #3: decoder fuzz hardening. Every mutation of a valid payload —
# truncation at any offset, any single-byte flip — must yield either a
# correct fixed-dim feature or a ValueError RAISED BY THE DECODER (message
# names the format/defect); never a struct.error, IndexError, or a numpy
# error (including numpy-raised ValueErrors like "buffer size must be a
# multiple of element size" or empty-array reductions), and never a silent
# short decode with non-finite stats.
_DECODE_ERR_WORDS = ("netpbm", "RIFF", "WAVE", "PCM", "media payload")


@st.composite
def _valid_media_payload(draw):
    import struct

    if draw(st.booleans()):  # netpbm P5/P6, 8- or 16-bit
        magic = draw(st.sampled_from([b"P5", b"P6"]))
        w, h = draw(st.integers(1, 4)), draw(st.integers(1, 3))
        maxval = draw(st.sampled_from([1, 255, 256, 65535]))
        ch = 1 if magic == b"P5" else 3
        n = w * h * ch * (2 if maxval > 255 else 1)
        raster = draw(st.binary(min_size=n, max_size=n))
        return magic + f"\n{w} {h}\n{maxval}\n".encode() + raster
    bits = draw(st.sampled_from([8, 16, 32]))
    n_ch, rate = draw(st.integers(1, 2)), 8000
    n = draw(st.integers(0, 16))
    pcm = draw(st.binary(min_size=n * (bits // 8), max_size=n * (bits // 8)))
    return (
        b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16)
        + struct.pack(
            "<HHIIHH", 1, n_ch, rate, rate * (bits // 8) * n_ch,
            (bits // 8) * n_ch, bits,
        )
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )


@given(payload=_valid_media_payload(), data=st.data())
@settings(max_examples=300, deadline=None)
def test_decoder_fuzz_truncate_and_flip_never_foreign_errors(payload, data):
    import math

    from fusion_spark.extras.multimodal import _real_feature

    if data.draw(st.booleans()):  # truncate at every possible offset
        mutated = payload[: data.draw(st.integers(0, len(payload) - 1))]
    else:  # flip one byte anywhere (header or raster/pcm)
        off = data.draw(st.integers(0, len(payload) - 1))
        mask = data.draw(st.integers(1, 255))
        mutated = payload[:off] + bytes([payload[off] ^ mask]) + payload[off + 1 :]
    try:
        vec = _real_feature(mutated, 8)
    except ValueError as e:
        assert any(w in str(e) for w in _DECODE_ERR_WORDS), (
            f"foreign ValueError escaped the decoder: {e!r}"
        )
    else:
        assert len(vec) == 8 and all(math.isfinite(v) for v in vec)


@given(payload=_valid_media_payload())
@settings(max_examples=100, deadline=None)
def test_decoder_accepts_every_generated_valid_payload(payload):
    import math

    from fusion_spark.extras.multimodal import _real_feature

    vec = _real_feature(payload, 8)
    assert len(vec) == 8 and all(math.isfinite(v) for v in vec)
