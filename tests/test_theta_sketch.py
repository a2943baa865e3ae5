"""Theta CompactSketch decoder (sources/theta_sketch.py) vs the REAL
org.apache.datasketches.theta library on Spark's JVM classpath —
every serialization mode (empty / single-item / exact / estimation)
and the union rollup."""
import pytest

from cam_etl_spark.sources.theta_sketch import (
    parse_theta,
    theta_estimate,
    theta_union_estimate,
)


def _java_sketch(jvm, keys, lgk=12):
    b = jvm.org.apache.datasketches.theta.UpdateSketch.builder()
    b.setLogNominalEntries(lgk)
    sk = b.build()
    for k in keys:
        sk.update(k)
    c = sk.compact()
    return (bytes(c.toByteArray()), c.getEstimate(),
            c.getRetainedEntries())


def test_all_modes_vs_java(spark):
    jvm = spark._jvm
    for n in (0, 1, 2, 3, 100, 4096, 100_000):
        raw, est, ret = _java_sketch(
            jvm, [f"key-{i}" for i in range(n)])
        p = parse_theta(raw)
        assert p["retained"] == ret, n
        assert theta_estimate(raw) == pytest.approx(est, rel=1e-12), n
        if n <= 4096:
            assert theta_estimate(raw) == n  # exact mode


def test_union_rollup_vs_java(spark):
    """Per-file sketches union to the table estimate the Java Union
    operator computes — overlapping key sets, mixed exact and
    estimation modes."""
    jvm = spark._jvm
    parts = [
        [f"k-{i}" for i in range(0, 3000)],
        [f"k-{i}" for i in range(1500, 4500)],
        [f"k-{i}" for i in range(4000, 30_000)],
    ]
    raws = [_java_sketch(jvm, p)[0] for p in parts]
    u = jvm.org.apache.datasketches.theta.SetOperation.builder() \
        .buildUnion()
    for raw in raws:
        mem = jvm.org.apache.datasketches.memory.Memory.wrap(raw)
        u.union(jvm.org.apache.datasketches.theta.Sketches
                .wrapSketch(mem))
    jest = u.getResult().getEstimate()
    ours = theta_union_estimate(raws)
    exact = 30_000
    # ours keeps every retained hash below min-theta (no nominal-k
    # re-trim), so it matches Java's estimator family, not its exact
    # trimmed value — both must sit within the sketch error band of
    # the true distinct count and of each other
    assert ours == pytest.approx(jest, rel=0.05)
    assert ours == pytest.approx(exact, rel=0.05)
    assert jest == pytest.approx(exact, rel=0.05)
    # exact-mode inputs union exactly
    small = [_java_sketch(jvm, [f"s-{i}" for i in range(a, b)])[0]
             for a, b in ((0, 1000), (500, 1500))]
    assert theta_union_estimate(small) == 1500


def test_loud_boundaries(spark):
    raw, _, _ = _java_sketch(spark._jvm, ["a", "b", "c"])
    with pytest.raises(ValueError, match="retained hashes"):
        parse_theta(raw[:-8])
    with pytest.raises(NotImplementedError, match="serial version"):
        parse_theta(bytes([2, 1]) + raw[2:])
    with pytest.raises(NotImplementedError, match="COMPACT"):
        parse_theta(bytes([2, 3, 2]) + raw[3:])
    with pytest.raises(ValueError, match="one preamble"):
        parse_theta(b"\x01\x03")


def test_non_default_seed_is_loud(spark):
    jvm = spark._jvm
    # the pinned default-seed hash IS the real library's
    util = jvm.org.apache.datasketches.thetacommon.ThetaUtil
    assert util.computeSeedHash(9001) & 0xFFFF == 37836
    b = jvm.org.apache.datasketches.theta.UpdateSketch.builder() \
        .setSeed(1234).build()
    for i in range(10):
        b.update(f"k-{i}")
    raw = bytes(b.compact().toByteArray())
    with pytest.raises(NotImplementedError, match="seed hash"):
        parse_theta(raw)
    # a custom-seed EMPTY sketch stays readable: Java zeroes the seed
    # hash on the canonical empty form (seed-agnostic by definition)
    e = jvm.org.apache.datasketches.theta.UpdateSketch.builder() \
        .setSeed(1234).build()
    assert parse_theta(bytes(e.compact().toByteArray()))["empty"]
