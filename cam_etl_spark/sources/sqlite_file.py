"""SQLite database FILE reader (round 13) — from the public file
format (sqlite.org/fileformat2): header, table b-tree walk, record
serial types, and overflow-page chains, with no sqlite library in the
read path. Many public datasets ship as ``.sqlite``/``.db`` files;
at 100 TB the database file is the shard unit — one task opens one
file's bytes and scans one table, embarrassingly parallel.

Referee: CPython's stdlib ``sqlite3`` (the real SQLite C library) is
the in-container writer and oracle — tests/test_sqlite_file.py builds
databases with every serial-type class, forced overflow chains, and
multi-level interior trees (PRAGMA page_size=512), then pins this
reader's rows against real SQL queries.

WITHOUT ROWID tables (round 13) are supported: they live in INDEX
b-trees (interior cells carry keys; the index local-payload threshold
differs from table leaves) with PRIMARY KEY columns stored first —
the reader walks the index tree and remaps to declared order.

WAL-mode databases (round 14) are supported via ``apply_wal``: the
``-wal`` sidecar's frames are validated (header checksum, salt pair,
cumulative frame-checksum chain, commit boundaries — the same
recovery rules SQLite applies) and merged over the main image, so an
uncheckpointed database reads exactly what a fresh SQLite connection
would see. A WAL-mode main file WITHOUT the sidecar applied stays a
loud gate in ``parse_header`` (reading it alone would silently miss
committed data).

UTF-16 text encodings and auto_vacuum databases are supported
(round 14): text serial values decode with the header's declared
encoding (UTF-16le/be), and pointer-map pages need no handling at
all — they are vacuum bookkeeping no b-tree pointer ever references,
so the root-down walk never touches them. Both referee'd against
sqlite3 on PRAGMA encoding / auto_vacuum fixtures.

Boundaries (loud): encrypted/corrupt headers and WAL format versions
other than 3007000. Secondary-index b-trees are never scanned (a
table scan does not need them), and a page-type mismatch between the
walker and the tree is a named error.
"""

from __future__ import annotations

import struct

_MAGIC = b"SQLite format 3\x00"


def _varint(buf: bytes, pos: int) -> tuple[int, int]:
    """SQLite varint: big-endian base-128, at most 9 bytes, the 9th
    byte contributing all 8 bits. Returns (value, next_pos)."""
    v = 0
    for i in range(8):
        b = buf[pos + i]
        v = (v << 7) | (b & 0x7F)
        if not b & 0x80:
            return v, pos + i + 1
    return (v << 8) | buf[pos + 8], pos + 9


def parse_header(buf: bytes) -> dict:
    if buf[:16] != _MAGIC:
        raise ValueError("sqlite: bad magic (not a SQLite 3 file)")
    (page_size,) = struct.unpack_from(">H", buf, 16)
    if page_size == 1:
        page_size = 65536
    write_ver, read_ver, reserved = buf[18], buf[19], buf[20]
    if read_ver > 1 or write_ver > 1:
        raise NotImplementedError(
            "sqlite: WAL-mode database — merge the -wal sidecar "
            "with apply_wal(db, wal) first (reading the main file "
            "alone would miss committed data)"
        )
    (n_pages,) = struct.unpack_from(">I", buf, 28)
    # auto_vacuum databases (round 14): the largest-root-page field
    # being nonzero means pointer-map pages are interleaved at fixed
    # intervals — but ptrmap pages exist only for vacuum bookkeeping
    # and are never referenced by any b-tree pointer, so a root-down
    # tree walk never touches them; no gate needed (referee'd against
    # sqlite3 on auto_vacuum=FULL/INCREMENTAL fixtures)
    (encoding,) = struct.unpack_from(">I", buf, 56)
    if encoding not in (1, 2, 3):
        raise ValueError(
            f"sqlite: text encoding {encoding} invalid (1=UTF-8, "
            "2=UTF-16le, 3=UTF-16be)"
        )
    return {
        "page_size": page_size,
        "usable": page_size - reserved,
        "n_pages": n_pages,
        # round 14: UTF-16 databases decode text values with the
        # header's declared encoding (referee'd against sqlite3 on
        # PRAGMA encoding='UTF-16le'/'UTF-16be' fixtures)
        "text_encoding": {1: "utf-8", 2: "utf-16-le",
                          3: "utf-16-be"}[encoding],
    }


def _page(buf: bytes, hdr: dict, pgno: int) -> bytes:
    ps = hdr["page_size"]
    page = buf[(pgno - 1) * ps: pgno * ps]
    if len(page) != ps:
        raise ValueError(f"sqlite: page {pgno} truncated")
    return page


def _record(payload: bytes, encoding: str = "utf-8") -> list:
    """Decode one record (the row format): header of serial types,
    then the values. ``encoding`` is the database header's declared
    text encoding (UTF-8 or either UTF-16 flavor)."""
    hlen, pos = _varint(payload, 0)
    serials = []
    while pos < hlen:
        s, pos = _varint(payload, pos)
        serials.append(s)
    if pos != hlen:
        raise ValueError("sqlite: record header length mismatch")
    out = []
    for s in serials:
        if s == 0:
            out.append(None)
        elif 1 <= s <= 6:
            n = (1, 2, 3, 4, 6, 8)[s - 1]
            out.append(int.from_bytes(payload[pos: pos + n], "big",
                                      signed=True))
            pos += n
        elif s == 7:
            (v,) = struct.unpack_from(">d", payload, pos)
            out.append(v)
            pos += 8
        elif s in (8, 9):
            out.append(s - 8)
        elif s >= 12 and s % 2 == 0:
            n = (s - 12) // 2
            out.append(payload[pos: pos + n])
            pos += n
        elif s >= 13:
            n = (s - 13) // 2
            out.append(payload[pos: pos + n].decode(encoding))
            pos += n
        else:
            raise NotImplementedError(
                f"sqlite: reserved serial type {s}"
            )
    if pos > len(payload):
        raise ValueError("sqlite: record body truncated")
    return out


def _cell_payload(buf: bytes, hdr: dict, page: bytes, pos: int,
                  is_index: bool = False) -> tuple[bytes, int]:
    """Cell payload at ``pos``: (full payload incl. overflow chain,
    rowid). Table-leaf cells carry a rowid varint and spill past
    X = U-35; index cells (the storage of WITHOUT ROWID tables)
    carry no rowid and spill past X = ((U-12)*64)/255 - 23 — the
    format's two local-payload thresholds."""
    plen, pos = _varint(page, pos)
    if is_index:
        rowid = 0
    else:
        rowid, pos = _varint(page, pos)
    u = hdr["usable"]
    x = ((u - 12) * 64) // 255 - 23 if is_index else u - 35
    if plen <= x:
        return page[pos: pos + plen], rowid
    m = ((u - 12) * 32) // 255 - 23
    k = m + (plen - m) % (u - 4)
    local = k if k <= x else m
    payload = bytearray(page[pos: pos + local])
    (nxt,) = struct.unpack_from(">I", page, pos + local)
    remaining = plen - local
    seen = set()
    while nxt:
        if nxt in seen:
            raise ValueError("sqlite: overflow chain cycle")
        seen.add(nxt)
        op = _page(buf, hdr, nxt)
        (nxt,) = struct.unpack_from(">I", op, 0)
        take = min(remaining, u - 4)
        payload += op[4: 4 + take]
        remaining -= take
    if remaining:
        raise ValueError(
            f"sqlite: overflow chain short by {remaining} bytes"
        )
    return bytes(payload), rowid


def _walk_table(buf: bytes, hdr: dict, pgno: int):
    """Yield (rowid, record values) from a table b-tree, in key
    order (interior pages walked left-to-right)."""
    page = _page(buf, hdr, pgno)
    off = 100 if pgno == 1 else 0
    ptype = page[off]
    (ncells,) = struct.unpack_from(">H", page, off + 3)
    if ptype == 5:  # interior table page
        (rightmost,) = struct.unpack_from(">I", page, off + 8)
        cp0 = off + 12
        for i in range(ncells):
            (cpos,) = struct.unpack_from(">H", page, cp0 + 2 * i)
            (child,) = struct.unpack_from(">I", page, cpos)
            yield from _walk_table(buf, hdr, child)
        yield from _walk_table(buf, hdr, rightmost)
    elif ptype == 13:  # leaf table page
        cp0 = off + 8
        for i in range(ncells):
            (cpos,) = struct.unpack_from(">H", page, cp0 + 2 * i)
            payload, rowid = _cell_payload(buf, hdr, page, cpos)
            yield rowid, _record(payload, hdr["text_encoding"])
    elif ptype in (2, 10):
        raise ValueError(
            "sqlite: index b-tree page in a rowid-table walk (a "
            "WITHOUT ROWID table must go through _walk_index)"
        )
    else:
        raise ValueError(f"sqlite: bad b-tree page type {ptype}")


def _walk_index(buf: bytes, hdr: dict, pgno: int):
    """Yield records from an index b-tree in key order — the storage
    of WITHOUT ROWID tables (round 13). Interior index cells CARRY
    keys (unlike table interiors): visit the child subtree, then the
    cell's own record, then the right-most pointer."""
    page = _page(buf, hdr, pgno)
    off = 100 if pgno == 1 else 0
    ptype = page[off]
    (ncells,) = struct.unpack_from(">H", page, off + 3)
    if ptype == 2:  # interior index page
        (rightmost,) = struct.unpack_from(">I", page, off + 8)
        cp0 = off + 12
        for i in range(ncells):
            (cpos,) = struct.unpack_from(">H", page, cp0 + 2 * i)
            (child,) = struct.unpack_from(">I", page, cpos)
            yield from _walk_index(buf, hdr, child)
            payload, _ = _cell_payload(buf, hdr, page, cpos + 4,
                                       is_index=True)
            yield _record(payload, hdr["text_encoding"])
        yield from _walk_index(buf, hdr, rightmost)
    elif ptype == 10:  # leaf index page
        cp0 = off + 8
        for i in range(ncells):
            (cpos,) = struct.unpack_from(">H", page, cp0 + 2 * i)
            payload, _ = _cell_payload(buf, hdr, page, cpos,
                                       is_index=True)
            yield _record(payload, hdr["text_encoding"])
    elif ptype in (5, 13):
        raise ValueError(
            "sqlite: table b-tree page in an index walk"
        )
    else:
        raise ValueError(f"sqlite: bad b-tree page type {ptype}")


def master_entries(buf: bytes) -> list[dict]:
    """sqlite_master rows (the schema table rooted at page 1):
    [{"type", "name", "tbl_name", "rootpage", "sql"}]."""
    hdr = parse_header(buf)
    out = []
    for _rowid, rec in _walk_table(buf, hdr, 1):
        out.append(dict(zip(
            ("type", "name", "tbl_name", "rootpage", "sql"), rec)))
    return out


def _columns_from_create(sql: str) -> tuple[list[str], int,
                                            list[str]]:
    """Column names from a stored CREATE TABLE statement, plus the
    position of the INTEGER PRIMARY KEY column (-1 if none — the
    rowid alias: its record slot is NULL and the value lives in the
    b-tree key) and the PRIMARY KEY column list (inline or
    table-constraint form — WITHOUT ROWID tables store PK columns
    FIRST and need the remap). Parser scope: the plain
    ``CREATE TABLE t (name TYPE ..., ...)`` statements the fixture
    writers produce; table constraints (UNIQUE, CHECK, FOREIGN KEY)
    are recognized and skipped; quoted or exotic column definitions
    stay loud."""
    i = sql.index("(")
    body = sql[i + 1: sql.rindex(")")]
    depth = 0
    parts, cur = [], []
    for ch in body:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    names = []
    ipk = -1
    pk_cols: list[str] = []
    pk_from_constraint = False
    col_type: dict[str, str] = {}
    constraints = ("primary", "unique", "check", "foreign",
                   "constraint")
    # tokens that end the declared-type run inside a column def
    col_kw = ("primary", "not", "null", "unique", "check",
              "default", "collate", "references", "generated", "as")
    for p in parts:
        toks = p.strip().split()
        if not toks:
            raise ValueError("sqlite: empty column definition")
        first = toks[0]
        low = p.lower()
        if first.lower() in constraints:
            if first.lower() == "primary" and "(" in p:
                inner = p[p.index("(") + 1: p.rindex(")")]
                pk_cols = [c.strip().split()[0]
                           for c in inner.split(",")]
                pk_from_constraint = True
            continue  # table-level constraint, not a column
        if first[0] in "\"'`[":
            raise NotImplementedError(
                f"sqlite: quoted column name {first!r} unsupported"
            )
        type_toks = []
        for tk in toks[1:]:
            if tk.lower() in col_kw:
                break
            type_toks.append(tk.lower())
        col_type[first] = " ".join(type_toks)
        if "primary" in low and "key" in low:
            pk_cols = [first]
            # documented SQLite quirk: inline "INTEGER PRIMARY KEY
            # DESC" is NOT a rowid alias (the table-constraint
            # "PRIMARY KEY(x DESC)" form IS)
            if col_type[first] == "integer" and \
                    "desc" not in (tk.lower() for tk in toks):
                ipk = len(names)
        names.append(first)
    # Table-constraint form ONLY: PRIMARY KEY(id) where id's declared
    # type is exactly INTEGER is a rowid alias too (SQLite rowid-alias
    # rule) — the value lives in the b-tree key, not the record slot.
    # The inline "INTEGER PRIMARY KEY DESC" quirk case must NOT be
    # re-promoted here: its pk_cols came from the column definition,
    # and SQLite treats that column as ordinary storage.
    if ipk == -1 and pk_from_constraint and len(pk_cols) == 1 \
            and col_type.get(pk_cols[0]) == "integer":
        ipk = names.index(pk_cols[0])
    return names, ipk, pk_cols


def read_table(buf: bytes, table: str) -> tuple[list[str],
                                                list[list]]:
    """Scan one table: (column names, rows). INTEGER PRIMARY KEY
    columns materialize from the rowid (their record slot is NULL by
    design); rows short of the schema (columns ADDed after the row
    was written) right-pad with None, matching SQLite's read
    behavior for missing trailing columns without defaults.
    WITHOUT ROWID tables (round 13) walk their index b-tree and
    remap the stored order (PRIMARY KEY columns first, remainder in
    declared order) back to the declared order."""
    hdr = parse_header(buf)
    entry = next(
        (e for e in master_entries(buf)
         if e["type"] == "table" and e["name"] == table),
        None,
    )
    if entry is None:
        raise ValueError(f"sqlite: no table named {table!r}")
    cols, ipk, pk_cols = _columns_from_create(entry["sql"])
    sql_tail = entry["sql"][entry["sql"].rindex(")") + 1:]
    without_rowid = "without" in sql_tail.lower() and \
        "rowid" in sql_tail.lower()
    rows = []
    if without_rowid:
        if not pk_cols:
            raise ValueError(
                "sqlite: WITHOUT ROWID table with no parsed "
                "PRIMARY KEY columns"
            )
        stored = pk_cols + [c for c in cols if c not in pk_cols]
        remap = [stored.index(c) for c in cols]
        for rec in _walk_index(buf, hdr, entry["rootpage"]):
            if len(rec) > len(cols):
                raise ValueError(
                    f"sqlite: row has {len(rec)} values for "
                    f"{len(cols)} columns"
                )
            rec = rec + [None] * (len(cols) - len(rec))
            rows.append([rec[remap[i]] for i in range(len(cols))])
        return cols, rows
    for rowid, rec in _walk_table(buf, hdr, entry["rootpage"]):
        if len(rec) < len(cols):
            rec = rec + [None] * (len(cols) - len(rec))
        elif len(rec) > len(cols):
            raise ValueError(
                f"sqlite: row has {len(rec)} values for "
                f"{len(cols)} columns"
            )
        if ipk >= 0 and rec[ipk] is None:
            rec[ipk] = rowid
        rows.append(rec)
    return cols, rows


_WAL_MAGICS = (0x377F0682, 0x377F0683)


def _wal_checksum(data: bytes, s0: int, s1: int, big: bool) -> tuple[int, int]:
    """The WAL cumulative checksum (fileformat2 §WAL): over pairs of
    32-bit words x0,x1 — s0 += x0 + s1; s1 += x1 + s0 (mod 2^32).
    Word byte order is selected by the magic's low bit (0x...83 =
    big-endian words), NOT the host's."""
    fmt = ">" if big else "<"
    n = len(data)
    if n % 8:
        raise ValueError("sqlite: WAL checksum input not 8-aligned")
    words = struct.unpack(f"{fmt}{n // 4}I", data)
    for i in range(0, n // 4, 2):
        s0 = (s0 + words[i] + s1) & 0xFFFFFFFF
        s1 = (s1 + words[i + 1] + s0) & 0xFFFFFFFF
    return s0, s1


def apply_wal(db: bytes, wal: bytes) -> bytes:
    """Merge an uncheckpointed ``-wal`` sidecar into the main database
    image (fileformat2 §"WAL File Format"): validate the WAL header
    (magic, format version 3007000, page size, header checksum), walk
    frames verifying the salt pair and the CUMULATIVE checksum chain,
    stop at the first invalid frame (the normal post-crash tail rule
    — salts from an earlier checkpoint generation end the valid
    region the same way), and let the LAST committed frame for each
    page override the main file. Commit frames (nonzero db-size
    field) delimit transactions: uncommitted trailing frames are
    discarded, exactly as SQLite recovery does. Returns a standalone
    rollback-journal-format image: page 1's read/write versions are
    rewritten to 1 and the in-header page count to the last commit's
    size, so every downstream walker works unchanged."""
    if len(wal) < 32:
        raise ValueError("sqlite: WAL header truncated")
    (magic, version, page_size, _ckpt_seq, salt1, salt2,
     ck1, ck2) = struct.unpack(">8I", wal[:32])
    if magic not in _WAL_MAGICS:
        raise ValueError(f"sqlite: bad WAL magic 0x{magic:08x}")
    if version != 3007000:
        raise NotImplementedError(
            f"sqlite: WAL format version {version} unsupported")
    big = bool(magic & 1)
    if db[:16] != _MAGIC:
        raise ValueError("sqlite: bad magic (not a SQLite 3 file)")
    (db_ps,) = struct.unpack_from(">H", db, 16)
    if db_ps == 1:
        db_ps = 65536
    if page_size != db_ps:
        raise ValueError(
            f"sqlite: WAL page size {page_size} != database "
            f"page size {db_ps}")
    s0, s1 = _wal_checksum(wal[:24], 0, 0, big)
    if (s0, s1) != (ck1, ck2):
        raise ValueError("sqlite: WAL header checksum mismatch")

    committed: dict[int, bytes] = {}
    pending: dict[int, bytes] = {}
    db_size = 0
    pos = 32
    frame_len = 24 + page_size
    while pos + frame_len <= len(wal):
        hdr = wal[pos: pos + 24]
        (pgno, commit_size, fsalt1, fsalt2,
         fck1, fck2) = struct.unpack(">6I", hdr)
        if (fsalt1, fsalt2) != (salt1, salt2):
            break  # earlier checkpoint generation: end of valid WAL
        page = wal[pos + 24: pos + frame_len]
        t0, t1 = _wal_checksum(hdr[:8], s0, s1, big)
        t0, t1 = _wal_checksum(page, t0, t1, big)
        if (t0, t1) != (fck1, fck2):
            break  # torn tail: recovery stops here
        s0, s1 = t0, t1
        if pgno == 0:
            raise ValueError("sqlite: WAL frame for page 0")
        pending[pgno] = page
        if commit_size:
            committed.update(pending)
            pending.clear()
            db_size = commit_size
        pos += frame_len

    if not committed:
        return db
    ps = page_size
    n_db_pages = len(db) // ps
    out = bytearray(db[: n_db_pages * ps])
    if db_size * ps > len(out):
        out.extend(b"\x00" * (db_size * ps - len(out)))
    else:
        del out[db_size * ps:]
    for pgno, page in committed.items():
        if pgno > db_size:
            continue  # truncated away by the last commit
        out[(pgno - 1) * ps: pgno * ps] = page
    # page 1 may itself come from the WAL and still carry WAL-mode
    # read/write versions — rewrite to the rollback-journal format so
    # parse_header's gate sees a standalone image
    out[18] = 1
    out[19] = 1
    struct.pack_into(">I", out, 28, db_size)
    return bytes(out)
