"""Apache DataSketches Theta CompactSketch deserialization from spec
(the serialization layout documented in the DataSketches project's
public memory-layout docs) — the payload of Iceberg's
``apache-datasketches-theta-v1`` Puffin blobs, i.e. the per-column
NDV statistics a planner uses for join ordering and distinct-count
estimates without touching data.

Layout (little-endian):
  byte 0  preamble longs (1 empty/single-item, 2 exact, 3 estimation)
  byte 1  serial version (3)
  byte 2  family id (3 = COMPACT)
  byte 5  flags: 1 BIG_ENDIAN, 2 READ_ONLY, 4 EMPTY, 8 COMPACT,
          16 ORDERED, 32 SINGLE_ITEM
  bytes 6-7   seed hash
  bytes 8-11  retained-entry count (preamble >= 2)
  bytes 16-23 theta as signed long (preamble == 3; else 2^63)
  then the retained hashes, 8 bytes each.
Estimate = count / (theta / 2^63); exact when theta == 2^63.

Verification: tests/test_theta_sketch.py cross-checks every mode —
empty, single-item, exact, estimation — against the REAL
org.apache.datasketches.theta library on Spark's JVM classpath
(byte arrays produced by the Java UpdateSketch/CompactSketch, our
estimate vs getEstimate(), retained count vs getRetainedEntries()).

Boundaries (loud): big-endian sketches, non-compact families, serial
versions other than 3, truncated hash arrays, and non-default seeds
raise. The seed hash (bytes 6-7) is validated against the default
update seed's hash — hashes from sketches built with different seeds
are mutually incomparable, so a silent mixed-seed union would return
a confidently wrong NDV (the worst failure mode for a stats rollup).
"""

from __future__ import annotations

_LONG_MAX = (1 << 63) - 1

#: computeSeedHash(DEFAULT_UPDATE_SEED=9001) — pinned against the real
#: org.apache.datasketches.thetacommon.ThetaUtil in
#: tests/test_theta_sketch.py (the Java short -27700 read unsigned).
_DEFAULT_SEED_HASH = 37836


def parse_theta(buf: bytes) -> dict:
    """CompactSketch bytes -> {"empty", "retained", "theta"
    (fraction in (0, 1]), "hashes" (tuple), "estimate"}."""
    if len(buf) < 8:
        raise ValueError("theta: sketch shorter than one preamble "
                         "long")
    pre, ser, family = buf[0], buf[1], buf[2]
    flags = buf[5]
    if ser != 3:
        raise NotImplementedError(f"theta: serial version {ser} "
                                  "unsupported (3 only)")
    if family != 3:
        raise NotImplementedError(f"theta: family {family} is not "
                                  "COMPACT(3)")
    if flags & 1:
        raise NotImplementedError("theta: big-endian sketch")
    if flags & 4:  # EMPTY (seed-agnostic: Java zeroes its seed hash)
        return {"empty": True, "retained": 0, "theta": 1.0,
                "theta_long": _LONG_MAX, "hashes": (),
                "estimate": 0.0}
    seed_hash = int.from_bytes(buf[6:8], "little")
    if seed_hash != _DEFAULT_SEED_HASH:
        raise NotImplementedError(
            f"theta: seed hash {seed_hash} is not the default seed's "
            f"{_DEFAULT_SEED_HASH} — sketches built with a custom seed "
            "hash incomparably, so estimating (or unioning) them "
            "against default-seed sketches would be silently wrong"
        )
    if flags & 32:  # SINGLE_ITEM
        if pre != 1 or len(buf) < 16:
            raise ValueError("theta: malformed single-item sketch")
        h = int.from_bytes(buf[8:16], "little")
        return {"empty": False, "retained": 1, "theta": 1.0,
                "theta_long": _LONG_MAX, "hashes": (h,),
                "estimate": 1.0}
    if pre not in (2, 3):
        raise ValueError(f"theta: preamble longs {pre} invalid for a "
                         "non-empty compact sketch")
    count = int.from_bytes(buf[8:12], "little")
    theta_long = _LONG_MAX
    start = 8 * pre
    if pre == 3:
        theta_long = int.from_bytes(buf[16:24], "little",
                                    signed=True)
        if not 0 < theta_long <= _LONG_MAX:
            raise ValueError(f"theta: theta long {theta_long} out of "
                             "range")
    if len(buf) < start + 8 * count:
        raise ValueError(
            f"theta: {count} retained hashes declared, buffer holds "
            f"{(len(buf) - start) // 8}"
        )
    hashes = tuple(
        int.from_bytes(buf[start + 8 * i: start + 8 * (i + 1)],
                       "little")
        for i in range(count)
    )
    frac = theta_long / _LONG_MAX
    return {"empty": False, "retained": count, "theta": frac,
            "theta_long": theta_long, "hashes": hashes,
            "estimate": count / frac}


def theta_estimate(buf: bytes) -> float:
    """Distinct-count estimate of one serialized CompactSketch."""
    return parse_theta(buf)["estimate"]


def theta_union_estimate(sketches: list[bytes]) -> float:
    """Estimate of the UNION of several compact sketches — the
    cross-file rollup a planner needs (per-file ndv blobs -> table
    ndv) without re-reading data: keep the minimum theta, count the
    distinct retained hashes below it. Unlike the Java Union
    operator this does NOT re-trim to a nominal k (the union here is
    a read-side rollup, not a bounded-memory accumulator), so it
    retains strictly MORE hashes than Java's result when the inputs
    overflow k — same estimator, finer resolution; the test pins
    both against the exact distinct count."""
    parsed = [parse_theta(b) for b in sketches]
    # the cut must be the exact integer thetaLong minimum — deriving
    # it from the float fraction can drift by ~2^10 and mis-classify
    # boundary hashes
    cut = min((p["theta_long"] for p in parsed if not p["empty"]),
              default=_LONG_MAX)
    kept = {h for p in parsed for h in p["hashes"] if h < cut}
    if not kept:
        return 0.0
    return len(kept) / (cut / _LONG_MAX)
