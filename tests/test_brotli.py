"""RFC 7932 brotli decoder vs pyarrow's independent brotli codec.

pyarrow bundles the reference brotli C implementation, so every
assertion here cross-checks the engine's from-spec decoder
(multimodal/brotli.py) against an independent implementation on
real encoder output — including quality-11 streams where the encoder
leans hardest on the static dictionary, word transforms, and context
modeling. The vendored tables (extracted, not transcribed — see
tools/extract_brotli_tables.py) are therefore verified behaviorally:
a single wrong dictionary byte, transform triplet, or context LUT
entry would mismatch here."""
import random

import pyarrow as pa
import pytest

from cam_etl_spark.multimodal.brotli import (
    _DICT_OFFSET,
    _NDBITS,
    _dictionary,
    _transform_word,
    brotli_decompress,
)


def _roundtrip(data: bytes, level: int | None = None) -> None:
    codec = (pa.Codec("brotli") if level is None
             else pa.Codec("brotli", compression_level=level))
    comp = codec.compress(data, asbytes=True)
    assert brotli_decompress(comp, len(data)) == data


def test_empty_and_tiny():
    for data in (b"", b"a", b"ab", b"\x00", b"\xff" * 3):
        _roundtrip(data)


def test_levels_text_binary_utf8():
    random.seed(7)
    words = ["the", "of", "and", "information", "available",
             "development", "government", "This is", "people",
             "http://www.example.com/", "résumé 中文 тест"]
    corpora = [
        (" ".join(random.choices(words, k=2000))).encode(),
        bytes(random.getrandbits(8) for _ in range(30000)),
        b"0123456789abcdef" * 4096,
        bytes(50000),
        ("日本語のテキスト " * 1500).encode(),
    ]
    for lvl in (0, 1, 2, 5, 9, 11):
        for data in corpora:
            _roundtrip(data, lvl)


def test_random_fuzz_default_level():
    random.seed(42)
    for _ in range(40):
        n = random.randint(1, 4000)
        _roundtrip(bytes(random.getrandbits(8) for _ in range(n)))


def _counting_decode(comp: bytes, n: int):
    """Decode while counting meta-blocks and dictionary-transform
    references, so tests can assert the feature under test is
    actually ON the decode path (not just that roundtrip holds)."""
    import cam_etl_spark.multimodal.brotli as B

    counts = {"metablocks": 0, "transforms": 0}
    orig_meta = B._decode_compressed_metablock
    orig_tw = B._transform_word

    def meta(*a, **k):
        counts["metablocks"] += 1
        return orig_meta(*a, **k)

    def tw(*a, **k):
        counts["transforms"] += 1
        return orig_tw(*a, **k)

    B._decode_compressed_metablock = meta
    B._transform_word = tw
    try:
        out = B.brotli_decompress(comp, n)
    finally:
        B._decode_compressed_metablock = orig_meta
        B._transform_word = orig_tw
    return out, counts


def test_multi_metablock_large():
    # quality 1 emits many small meta-blocks over a 1.7 MB input;
    # assert the multi-meta-block path genuinely runs
    random.seed(1)
    words = ["the", "of", "and", "that", "with", "from", "this"]
    data = (" ".join(random.choices(words, k=400_000))).encode()
    comp = pa.Codec("brotli", compression_level=1).compress(
        data, asbytes=True)
    out, counts = _counting_decode(comp, len(data))
    assert out == data
    assert counts["metablocks"] >= 2
    _roundtrip(data, 5)


def test_high_quality_hits_dictionary_transforms():
    """Quality 9-11 on English text emits static-dictionary
    references with transforms (uppercase-first, suffix-append, …).
    Roundtrip + an instrumented count proves the vendored Appendix
    A/B tables are on the hot path (measured: 23 transform refs at
    q9, 7 at q11 for this text)."""
    text = ("The government information. Available development! "
            "Different because public working national community "
            "education individual performance international "
            "understanding environment technology management "
            "Professional experience knowledge Department street "
            "president Questions Windows Security Anderson ").encode()
    for lvl in (9, 11):
        comp = pa.Codec("brotli", compression_level=lvl).compress(
            text, asbytes=True)
        out, counts = _counting_decode(comp, len(text))
        assert out == text
        assert counts["transforms"] >= 1


def test_vendored_dictionary_words():
    """Spot-check the vendored Appendix A dictionary: the geometry is
    RFC-fixed, and known words sit at known addresses."""
    d = _dictionary()
    assert len(d) == 122_784
    assert d[:4] == b"time"
    assert d[4:8] == b"down"
    # bucket boundaries: first length-5 word starts at offset 4096
    assert _DICT_OFFSET[5] == 4096 and d[4096:4101] == b"first"
    assert sum(ln << _NDBITS[ln] for ln in range(4, 25)) == 122_784


def test_transforms_semantics():
    assert _transform_word(b"time", 0) == b"time"
    assert _transform_word(b"time", 1) == b"time "
    # omit-first-1
    assert _transform_word(b"time", 3) == b"ime"
    # ferment-first with trailing space
    assert _transform_word(b"time", 4) == b"Time "
    # ferment-first on a 2-byte UTF-8 char flips bit 5 of the
    # continuation byte (RFC 7932 section 8)
    word = "é".encode() + b"x"
    out = _transform_word(word, 9)  # bare ferment-first
    assert out[0] == word[0] and out[1] == word[1] ^ 32


def test_loud_boundaries():
    with pytest.raises(ValueError, match="truncated"):
        brotli_decompress(b"")
    comp = pa.Codec("brotli").compress(b"hello world " * 10,
                                       asbytes=True)
    with pytest.raises(ValueError, match="truncated"):
        brotli_decompress(comp[:-2])
    with pytest.raises(ValueError, match="trailing"):
        brotli_decompress(comp + b"\x00\x00")
    with pytest.raises(ValueError, match="expected"):
        brotli_decompress(comp, 5)


def test_parquet_brotli_pages(tmp_path):
    """Real pyarrow-written BROTLI parquet decodes value-exact
    through the engine's from-spec page reader at several levels."""
    import pyarrow.parquet as pq

    from cam_etl_spark.sources.parquet_meta import parse_footer
    from cam_etl_spark.sources.parquet_pages import decode_column_chunk

    random.seed(3)
    words = ["the", "of", "and", "information", "available", "time"]
    txt = [" ".join(random.choices(words, k=random.randint(3, 40)))
           for _ in range(400)]
    vals = [random.random() for _ in range(400)]
    tab = pa.table({
        "id": pa.array(range(400), pa.int64()),
        "txt": pa.array(txt),
        "val": pa.array(vals, pa.float64()),
    })
    for lvl in (1, 9, 11):
        f = str(tmp_path / f"t{lvl}.parquet")
        pq.write_table(tab, f, compression="BROTLI",
                       compression_level=lvl)
        raw = open(f, "rb").read()
        foot = parse_footer(raw)
        rg = foot["row_groups"][0]
        cols = {c["path"]: c for c in rg["columns"]}
        assert cols["id"]["codec"] == "BROTLI"
        assert decode_column_chunk(raw, cols["id"],
                                   rg["num_rows"]) == list(range(400))
        got_txt = decode_column_chunk(raw, cols["txt"], rg["num_rows"])
        assert [t.decode() if isinstance(t, bytes) else t
                for t in got_txt] == txt
        assert decode_column_chunk(raw, cols["val"],
                                   rg["num_rows"]) == vals
