"""SQLite file reader (sources/sqlite_file.py) vs the REAL SQLite —
stdlib sqlite3 writes every fixture and answers every oracle query.
Coverage: all serial-type classes (every int width via value ranges,
float, 0/1 constants, text incl. non-ASCII, blob, NULL), forced
overflow chains and multi-level interior trees (PRAGMA
page_size=512), INTEGER PRIMARY KEY rowid aliasing in every spelling
(inline, table-constraint, the DESC quirk), ALTER TABLE ADD COLUMN
short rows, WITHOUT ROWID tables, WAL sidecar merge (torn tails,
RESTART salt generations, referee'd against sqlite3 on the same file
copies), UTF-16le/be text encodings, auto_vacuum databases, and the
remaining loud boundaries (bare WAL main file without the sidecar,
unknown table)."""

import os
import sqlite3

import pytest

from cam_etl_spark.sources.sqlite_file import (
    master_entries,
    parse_header,
    read_table,
)


def _build(path, page_size=512):
    con = sqlite3.connect(path)
    con.execute(f"PRAGMA page_size={page_size}")
    con.execute("PRAGMA auto_vacuum=0")
    return con


def test_all_serial_types_vs_real_sqlite(tmp_path):
    f = str(tmp_path / "types.db")
    con = _build(f)
    con.execute(
        "CREATE TABLE t (id INTEGER PRIMARY KEY, i INT, r REAL, "
        "s TEXT, b BLOB)")
    rows = [
        (1, 0, 0.5, "plain", b"\x00\x01"),
        (2, 1, -1.25, "café →", b""),
        (3, -1, 1e300, "", b"\xff" * 40),
        (4, 127, None, None, None),             # 1-byte int
        (5, -32768, 2.0, "two", b"x"),          # 2-byte int
        (6, 8388607, 3.0, "three", b"y"),       # 3-byte int
        (7, -2147483648, 4.0, "four", b"z"),    # 4-byte int
        (8, 2 ** 40, 5.0, "five", b"q"),        # 6-byte int
        (9, -(2 ** 62), 6.0, "six", b"w"),      # 8-byte int
    ]
    con.executemany("INSERT INTO t VALUES (?,?,?,?,?)", rows)
    con.commit()
    con.close()

    buf = open(f, "rb").read()
    cols, got = read_table(buf, "t")
    assert cols == ["id", "i", "r", "s", "b"]
    ref = sqlite3.connect(f).execute(
        "SELECT * FROM t ORDER BY id").fetchall()
    assert [tuple(r) for r in got] == ref


def test_overflow_chains_and_interior_pages(tmp_path):
    f = str(tmp_path / "big.db")
    con = _build(f, page_size=512)
    con.execute("CREATE TABLE big (k INTEGER PRIMARY KEY, v TEXT)")
    # long rows force multi-page overflow chains at 512-byte pages;
    # 400 rows force interior table pages
    rows = [(k, f"v{k}-" + "x" * (k % 7 * 400)) for k in range(400)]
    con.executemany("INSERT INTO big VALUES (?,?)", rows)
    con.commit()
    con.close()
    buf = open(f, "rb").read()
    hdr = parse_header(buf)
    assert hdr["page_size"] == 512 and hdr["n_pages"] > 100
    cols, got = read_table(buf, "big")
    ref = sqlite3.connect(f).execute(
        "SELECT * FROM big ORDER BY k").fetchall()
    assert [tuple(r) for r in got] == ref


def test_master_add_column_and_boundaries(tmp_path):
    f = str(tmp_path / "m.db")
    con = _build(f)
    con.execute("CREATE TABLE a (x INT, y TEXT)")
    con.execute("INSERT INTO a VALUES (1, 'one')")
    con.commit()
    # rows written BEFORE the ADD COLUMN stay short on disk
    con.execute("ALTER TABLE a ADD COLUMN z INT")
    con.execute("INSERT INTO a VALUES (2, 'two', 22)")
    # an index adds an index b-tree that the scan must never touch
    con.execute("CREATE INDEX ix ON a (y)")
    con.commit()
    con.close()
    buf = open(f, "rb").read()
    names = {e["name"]: e["type"] for e in master_entries(buf)}
    assert names == {"a": "table", "ix": "index"}
    cols, got = read_table(buf, "a")
    assert cols == ["x", "y", "z"]
    assert sorted(map(tuple, got)) == [(1, "one", None),
                                       (2, "two", 22)]
    with pytest.raises(ValueError, match="no table named"):
        read_table(buf, "nope")
    with pytest.raises(ValueError, match="bad magic"):
        parse_header(b"\x00" * 100)


def test_wal_mode_is_loud(tmp_path):
    f = str(tmp_path / "wal.db")
    con = _build(f)
    con.execute("CREATE TABLE w (x INT)")
    con.execute("INSERT INTO w VALUES (7)")
    con.commit()
    con.execute("PRAGMA journal_mode=WAL")
    con.execute("INSERT INTO w VALUES (8)")
    con.commit()
    con.close()
    # remove sidecar files; the main file now declares WAL format
    for ext in ("-wal", "-shm"):
        p = f + ext
        if os.path.exists(p):
            os.unlink(p)
    with pytest.raises(NotImplementedError, match="WAL"):
        parse_header(open(f, "rb").read())


def test_without_rowid_tables_vs_real_sqlite(tmp_path):
    """WITHOUT ROWID tables store rows in INDEX b-trees with PK
    columns first: single + composite PKs, interior index pages and
    index overflow chains forced with 512-byte pages, remapped back
    to declared order — row-exact against real SQLite."""
    f = str(tmp_path / "wr.db")
    con = _build(f, page_size=512)
    con.execute(
        "CREATE TABLE wr (v TEXT, k INTEGER PRIMARY KEY, n INT) "
        "WITHOUT ROWID")
    rows = [(f"val{k}-" + "y" * (k % 5 * 300), k, -k)
            for k in range(300)]
    con.executemany("INSERT INTO wr VALUES (?,?,?)", rows)
    con.execute(
        "CREATE TABLE pair (a INT, b TEXT, c REAL, "
        "PRIMARY KEY (b, a)) WITHOUT ROWID")
    con.executemany("INSERT INTO pair VALUES (?,?,?)",
                    [(i, f"key{i % 7}-{i}", i / 4) for i in range(50)])
    con.commit()
    con.close()
    buf = open(f, "rb").read()
    ref = sqlite3.connect(f)
    cols, got = read_table(buf, "wr")
    assert cols == ["v", "k", "n"]
    assert sorted(map(tuple, got)) == sorted(
        ref.execute("SELECT * FROM wr").fetchall())
    cols2, got2 = read_table(buf, "pair")
    assert cols2 == ["a", "b", "c"]
    assert sorted(map(tuple, got2)) == sorted(
        ref.execute("SELECT * FROM pair").fetchall())


def test_integer_pk_forms_vs_real_sqlite(tmp_path):
    """Round 14 (advice): the rowid-alias rule covers BOTH spellings
    — inline 'id INTEGER PRIMARY KEY' and table-constraint
    'PRIMARY KEY(id)' where id's declared type is exactly INTEGER
    (value lives in the b-tree key, record slot is NULL). 'INT' is
    NOT an alias, and the documented SQLite quirk: inline
    'INTEGER PRIMARY KEY DESC' is NOT an alias while the
    table-constraint 'PRIMARY KEY(id DESC)' form IS. The real
    sqlite3 is the referee for every form."""
    import sqlite3

    from cam_etl_spark.sources.sqlite_file import read_table

    p = str(tmp_path / "ipk.sqlite")
    con = sqlite3.connect(p)
    forms = {
        "t_table_pk": "CREATE TABLE t_table_pk "
                      "(id INTEGER, v TEXT, PRIMARY KEY(id))",
        "t_inline": "CREATE TABLE t_inline "
                    "(id INTEGER PRIMARY KEY, v TEXT)",
        "t_int_not_alias": "CREATE TABLE t_int_not_alias "
                           "(id INT, v TEXT, PRIMARY KEY(id))",
        "t_desc_quirk": "CREATE TABLE t_desc_quirk "
                        "(id INTEGER, v TEXT, PRIMARY KEY(id DESC))",
        "t_inline_desc": "CREATE TABLE t_inline_desc "
                         "(id INTEGER PRIMARY KEY DESC, v TEXT)",
    }
    for sql in forms.values():
        con.execute(sql)
    for t in forms:
        con.executemany(f"INSERT INTO {t} VALUES (?, ?)",
                        [(1, "a"), (2, "b"), (42, "c")])
    con.commit()
    buf = open(p, "rb").read()
    for t in forms:
        ref = con.execute(
            f"SELECT id, v FROM {t} ORDER BY rowid").fetchall()
        cols, rows = read_table(buf, t)
        assert cols == ["id", "v"]
        assert [tuple(r) for r in rows] == ref, t
    con.close()


def _wal_copy(con, src, dst_dir, name):
    """Copy main+wal bytes while the writer connection is open (close
    would auto-checkpoint and fold the WAL away)."""
    os.makedirs(dst_dir, exist_ok=True)
    dst = os.path.join(dst_dir, name)
    with open(src, "rb") as fh:
        open(dst, "wb").write(fh.read())
    with open(src + "-wal", "rb") as fh:
        open(dst + "-wal", "wb").write(fh.read())
    return dst


def test_wal_sidecar_vs_real_sqlite(tmp_path):
    """Round 14: apply_wal merges an uncheckpointed -wal over the
    main image — base rows checkpointed to the main file, then
    UPDATE and DELETE commits living only in the WAL. The referee is
    a fresh sqlite3 connection on copies of the same two files:
    whatever the real library recovers, the reader must return."""
    import sqlite3

    from cam_etl_spark.sources.sqlite_file import apply_wal, read_table

    p = str(tmp_path / "w.sqlite")
    con = sqlite3.connect(p)
    con.execute("PRAGMA journal_mode=WAL")
    con.execute("PRAGMA wal_autocheckpoint=0")
    con.execute("CREATE TABLE t "
                "(id INTEGER PRIMARY KEY, v TEXT, x REAL)")
    con.executemany("INSERT INTO t VALUES (?,?,?)",
                    [(i, f"row{i}" * 3, i * 1.5) for i in range(200)])
    con.commit()
    con.execute("PRAGMA wal_checkpoint(TRUNCATE)")
    con.execute("UPDATE t SET v = 'updated' WHERE id % 7 = 0")
    con.commit()
    con.execute("DELETE FROM t WHERE id % 31 = 5")
    con.commit()
    dst = _wal_copy(con, p, str(tmp_path / "copy"), "w.sqlite")
    con.close()

    ref = sqlite3.connect(dst).execute(
        "SELECT id, v, x FROM t ORDER BY id").fetchall()
    img = apply_wal(open(dst, "rb").read(),
                    open(dst + "-wal", "rb").read())
    cols, rows = read_table(img, "t")
    assert cols == ["id", "v", "x"]
    assert sorted(map(tuple, rows)) == sorted(ref)
    # the WAL is load-bearing: without it the updates/deletes vanish
    assert any(v == "updated" for _, v, _x in rows)
    assert len(rows) < 200


def test_wal_torn_tail_matches_real_recovery(tmp_path):
    """A WAL truncated mid-frame (crash shape): recovery stops at the
    last valid commit. The referee is sqlite3 itself opening the SAME
    truncated copy — both must see the state as of that commit."""
    import sqlite3

    from cam_etl_spark.sources.sqlite_file import apply_wal, read_table

    p = str(tmp_path / "w.sqlite")
    con = sqlite3.connect(p)
    con.execute("PRAGMA journal_mode=WAL")
    con.execute("PRAGMA wal_autocheckpoint=0")
    con.execute("CREATE TABLE t (id INTEGER PRIMARY KEY, v TEXT)")
    con.executemany("INSERT INTO t VALUES (?,?)",
                    [(i, f"v{i}") for i in range(50)])
    con.commit()
    con.execute("PRAGMA wal_checkpoint(TRUNCATE)")
    con.execute("UPDATE t SET v = 'first' WHERE id < 10")
    con.commit()
    con.execute("UPDATE t SET v = 'second' WHERE id >= 40")
    con.commit()
    dst = _wal_copy(con, p, str(tmp_path / "copy"), "w.sqlite")
    con.close()

    wal = open(dst + "-wal", "rb").read()
    torn = wal[: len(wal) - 100]  # cut into the last commit's frames
    open(dst + "-wal", "wb").write(torn)
    ref = sqlite3.connect(dst).execute(
        "SELECT id, v FROM t ORDER BY id").fetchall()
    img = apply_wal(open(dst, "rb").read(), torn)
    _cols, rows = read_table(img, "t")
    assert sorted(map(tuple, rows)) == sorted(ref)
    # the first commit survived, the torn second did not
    vs = dict(rows)
    assert vs[0] == "first" and vs[49] == "v49"


def test_wal_restart_salts_end_valid_region(tmp_path):
    """After wal_checkpoint(RESTART) the WAL rewinds and new frames
    carry a NEW salt; stale frames from the previous generation may
    still follow on disk. apply_wal must stop at the first
    old-generation salt — again pinned against sqlite3 on the same
    copies."""
    import sqlite3

    from cam_etl_spark.sources.sqlite_file import apply_wal, read_table

    p = str(tmp_path / "w.sqlite")
    con = sqlite3.connect(p)
    con.execute("PRAGMA journal_mode=WAL")
    con.execute("PRAGMA wal_autocheckpoint=0")
    con.execute("CREATE TABLE t (id INTEGER PRIMARY KEY, v TEXT)")
    con.executemany("INSERT INTO t VALUES (?,?)",
                    [(i, f"v{i}") for i in range(80)])
    con.commit()
    # several commits to GROW the wal, then RESTART + one small commit
    for k in range(4):
        con.execute(f"UPDATE t SET v = 'gen0_{k}' WHERE id % 4 = {k}")
        con.commit()
    con.execute("PRAGMA wal_checkpoint(RESTART)")
    con.execute("UPDATE t SET v = 'gen1' WHERE id = 7")
    con.commit()
    dst = _wal_copy(con, p, str(tmp_path / "copy"), "w.sqlite")
    con.close()

    wal = open(dst + "-wal", "rb").read()
    ref = sqlite3.connect(dst).execute(
        "SELECT id, v FROM t ORDER BY id").fetchall()
    img = apply_wal(open(dst, "rb").read(), wal)
    _cols, rows = read_table(img, "t")
    assert sorted(map(tuple, rows)) == sorted(ref)
    vs = dict(rows)
    assert vs[7] == "gen1" and vs[11] == "gen0_3"


@pytest.mark.parametrize("enc", ["UTF-16le", "UTF-16be"])
def test_utf16_encodings_vs_real_sqlite(tmp_path, enc):
    """Round 14 (was a loud boundary): text serial values decode
    with the header's declared encoding. Non-ASCII text (plane-0 and
    an astral emoji, which UTF-16 stores as a surrogate pair)
    round-trips byte-exact against sqlite3."""
    import sqlite3

    from cam_etl_spark.sources.sqlite_file import read_table

    p = str(tmp_path / f"{enc}.sqlite")
    con = sqlite3.connect(p)
    con.execute(f"PRAGMA encoding='{enc}'")
    con.execute("CREATE TABLE t (id INTEGER PRIMARY KEY, v TEXT)")
    vals = [(1, "plain ascii"), (2, "héllo wörld"),
            (3, "日本語テキスト"), (4, "emoji 🎉 pair"),
            (5, "long " + "λ" * 500)]  # forces overflow in UTF-16
    con.executemany("INSERT INTO t VALUES (?,?)", vals)
    con.commit()
    con.close()
    buf = open(p, "rb").read()
    ref = sqlite3.connect(p).execute(
        "SELECT id, v FROM t ORDER BY id").fetchall()
    cols, rows = read_table(buf, "t")
    assert cols == ["id", "v"]
    assert [tuple(r) for r in rows] == ref


def test_auto_vacuum_vs_real_sqlite(tmp_path):
    """Round 14 (was a loud boundary): auto_vacuum databases carry
    pointer-map pages at fixed intervals, but no b-tree pointer ever
    references them — the walk must simply never land on one. Small
    pages + churn force multiple ptrmap pages and page relocation."""
    import sqlite3

    from cam_etl_spark.sources.sqlite_file import read_table

    for mode in ("FULL", "INCREMENTAL"):
        p = str(tmp_path / f"av_{mode}.sqlite")
        con = sqlite3.connect(p)
        con.execute("PRAGMA page_size=512")
        con.execute(f"PRAGMA auto_vacuum={mode}")
        con.execute("CREATE TABLE t (id INTEGER PRIMARY KEY, "
                    "v TEXT)")
        con.executemany("INSERT INTO t VALUES (?,?)",
                        [(i, f"value-{i} " * 20)
                         for i in range(400)])
        con.commit()
        con.execute("DELETE FROM t WHERE id % 3 = 0")
        con.commit()
        if mode == "INCREMENTAL":
            con.execute("PRAGMA incremental_vacuum")
            con.commit()
        con.close()
        buf = open(p, "rb").read()
        import struct as _s
        assert _s.unpack_from(">I", buf, 52)[0] != 0  # really av
        ref = sqlite3.connect(p).execute(
            "SELECT id, v FROM t ORDER BY id").fetchall()
        _cols, rows = read_table(buf, "t")
        assert sorted(map(tuple, rows)) == ref, mode


def test_inline_desc_pk_null_values_vs_real_sqlite(tmp_path):
    """Round 14 (review): inline 'INTEGER PRIMARY KEY DESC' is NOT a
    rowid alias, so its column may hold NULL — the reader must
    return NULL there, never fabricate the rowid. (The
    table-constraint fallback must not re-promote this case.)"""
    import sqlite3

    from cam_etl_spark.sources.sqlite_file import read_table

    p = str(tmp_path / "q.sqlite")
    con = sqlite3.connect(p)
    con.execute("CREATE TABLE q (x INTEGER PRIMARY KEY DESC, "
                "y TEXT)")
    con.execute("INSERT INTO q VALUES (NULL, 'nullkey')")
    con.execute("INSERT INTO q VALUES (5, 'five')")
    con.commit()
    con.close()
    ref = sqlite3.connect(p).execute(
        "SELECT x, y FROM q ORDER BY rowid").fetchall()
    _cols, rows = read_table(open(p, "rb").read(), "q")
    assert [tuple(r) for r in rows] == ref
    assert rows[0][0] is None
