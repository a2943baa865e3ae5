"""Property-based tests for the round-10 lake surfaces: random
replayed states roundtrip through BOTH checkpoint writers, and the
v1 ORC integer codec roundtrips arbitrary sequences. Hypothesis
generates the adversarial shapes (empty tables, single files, deep
partition values, DV descriptors) that example tests miss."""

import json
import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cam_etl_spark.sources import delta_log as D
from cam_etl_spark.sources import orc_read as O

_META = {
    "id": "prop-fixture",
    "format": {"provider": "parquet", "options": {}},
    "schemaString": "{}",
    "partitionColumns": [],
    "configuration": {},
}

_pv = st.dictionaries(
    st.sampled_from(["p", "q"]),
    st.text(alphabet="abcxyz0123", min_size=1, max_size=6),
    max_size=2,
)

_stats = st.one_of(
    st.none(),
    st.fixed_dictionaries(
        {"numRecords": st.integers(0, 10**9)},
        optional={
            "minValues": st.fixed_dictionaries({"k": st.integers(-100, 100)}),
            "maxValues": st.fixed_dictionaries({"k": st.integers(-100, 100)}),
        },
    ),
)

_dv = st.one_of(
    st.none(),
    st.fixed_dictionaries(
        {
            "storageType": st.just("i"),
            "pathOrInlineDv": st.text(alphabet="abAB01", min_size=4,
                                      max_size=12),
            "sizeInBytes": st.integers(1, 1000),
            "cardinality": st.integers(0, 1000),
        }
    ),
)

_file = st.builds(
    lambda path, pv, size, stats, dv: {
        "path": path,
        "partitionValues": pv,
        "size": size,
        "modificationTime": 0,
        "stats": stats,
        "deletionVector": dv,
    },
    st.uuids().map(lambda u: f"part-{u}.parquet"),
    _pv,
    st.integers(0, 10**12),
    _stats,
    _dv,
)

_state = st.builds(
    lambda files: {
        "metadata": dict(_META),
        "protocol": {"minReaderVersion": 1, "minWriterVersion": 2},
        "files": sorted(files, key=lambda f: f["path"]),
    },
    st.lists(_file, max_size=8, unique_by=lambda f: f["path"]),
)


def _normalize(files):
    return [
        {
            "path": f["path"],
            "partitionValues": f["partitionValues"],
            "size": f["size"],
            "stats": f.get("stats"),
            "deletionVector": f.get("deletionVector"),
        }
        for f in files
    ]


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(state=_state, n_sidecars=st.integers(1, 4))
def test_checkpoint_writers_roundtrip_any_state(tmp_path_factory, state,
                                                n_sidecars):
    """Classic AND v2 checkpoints must replay to the exact live state
    they were written from — paths, partition values, stats and DV
    descriptors — for arbitrary (incl. empty) file sets."""
    d = str(tmp_path_factory.mktemp("tbl"))
    D.write_commit(
        d, 0,
        [{"protocol": state["protocol"]}, {"metaData": state["metadata"]}]
        + [
            {"add": {
                "path": f["path"], "partitionValues": f["partitionValues"],
                "size": f["size"], "modificationTime": 0,
                "dataChange": True,
                **({"stats": json.dumps(f["stats"])} if f["stats"] else {}),
                **({"deletionVector": f["deletionVector"]}
                   if f["deletionVector"] else {}),
            }}
            for f in state["files"]
        ],
    )
    base = D.replay_log(d)
    for writer, version in ((D.write_checkpoint, 1),
                            (D.write_checkpoint_v2, 2)):
        if writer is D.write_checkpoint_v2:
            writer(d, version, base, n_sidecars=n_sidecars)
        else:
            writer(d, version, base)
        # a checkpoint version needs a commit OR checkpoint at it;
        # the checkpoint itself provides it
        snap = D.replay_log(d, version=version)
        assert snap["from_checkpoint"] == version
        assert _normalize(snap["files"]) == _normalize(base["files"])
        assert snap["protocol"] == base["protocol"]
        assert snap["metadata"]["id"] == base["metadata"]["id"]


@settings(max_examples=60, deadline=None)
@given(
    vals=st.lists(st.integers(-(2**62), 2**62 - 1), max_size=300),
    signed=st.booleans(),
)
def test_rle_v1_roundtrips_any_sequence(vals, signed):
    if not signed:
        vals = [abs(v) for v in vals]
    enc = O.rle_v1_encode(vals, signed)
    assert O.rle_v1(enc, len(vals), signed) == vals


# ---------------------------------------------------------------------------
# Round-11 surfaces: puffin deletion vectors and the SBBF bloom math
# ---------------------------------------------------------------------------

_positions = st.lists(
    st.integers(0, 2**40), min_size=0, max_size=400, unique=True
)


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.tuples(st.text(alphabet="abz/.-_0123", min_size=1,
                                  max_size=30),
                          _positions),
                min_size=1, max_size=5))
def test_puffin_dv_roundtrip_property(tmp_path_factory, dvs):
    """Arbitrary (referenced file, position set) lists roundtrip
    through write_puffin_dvs -> footer -> read_deletion_vector, with
    cardinalities checked and blobs independent of their neighbors."""
    from cam_etl_spark.sources import iceberg_meta as I

    p = str(tmp_path_factory.mktemp("puffin") / "dv.puffin")
    frags = I.write_puffin_dvs(p, dvs)
    buf = open(p, "rb").read()
    foot = I.read_puffin_footer(buf)
    assert len(foot["blobs"]) == len(dvs)
    for (ref, pos), frag, blob in zip(dvs, frags, foot["blobs"]):
        want = sorted(set(pos))
        assert frag["cardinality"] == len(want)
        assert blob["properties"]["referenced-data-file"] == ref
        assert (blob["offset"], blob["length"]) == (
            frag["offset"], frag["length"])
        got = I.read_deletion_vector(
            buf, frag["offset"], frag["length"], frag["cardinality"])
        assert got == want


def _sbbf_insert(bitset: bytearray, h: int) -> None:
    """From-spec block_insert (test-local): same block/salt math the
    reader uses — any disagreement between the two derivations makes
    inserted values fail membership."""
    from cam_etl_spark.sources.parquet_meta import _SBBF_SALT

    n_blocks = len(bitset) // 32
    block = ((h >> 32) * n_blocks) >> 32
    lo = h & 0xFFFFFFFF
    base = block * 32
    for i in range(8):
        bit = ((lo * _SBBF_SALT[i]) & 0xFFFFFFFF) >> 27
        w = int.from_bytes(bitset[base + 4 * i: base + 4 * i + 4],
                           "little")
        bitset[base + 4 * i: base + 4 * i + 4] = (
            w | (1 << bit)).to_bytes(4, "little")


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.integers(-2**62, 2**62), min_size=1, max_size=300,
             unique=True),
    st.sampled_from([32, 64, 256, 1024]),
)
def test_sbbf_no_false_negatives_property(values, n_bytes):
    """SBBF soundness: every inserted value passes membership, for
    any bitset size — the bloom's defining invariant (false
    positives are allowed; false negatives never)."""
    from cam_etl_spark.sources.parquet_meta import (
        bloom_hash,
        bloom_might_contain,
    )

    bitset = bytearray(n_bytes)
    hashes = [bloom_hash(v, "INT64") for v in values]
    for h in hashes:
        _sbbf_insert(bitset, h)
    assert all(bloom_might_contain(bytes(bitset), h) for h in hashes)
