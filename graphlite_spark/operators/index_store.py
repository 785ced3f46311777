"""Versioned-manifest commit layer shared by the three persisted
index families (dedup: operators/dedup.py, BM25: operators/text.py,
ANN: operators/similarity.py).

Before this layer, compaction swapped an index's base directories
with a multi-step rename dance (rename old away, rename compacted
in, delete deltas) — honest about its hazard window ("run between
epochs") but a reader racing a compaction could observe a missing
base dir, and a crash mid-swap needed manual recovery from a
`_precompact` backup. This module replaces that with the standard
LSM/table-format discipline (the same shape Delta/Iceberg commit
logs use, re-derived from first principles on plain Hadoop FS
calls):

- **Versioned bases**: compaction writes the folded base NEXT TO the
  live one (``{tier}_v{n}``), never over it.
- **One-file manifest commits**: the set of live base dirs, the
  committed ingest high-water mark (``hwm``) and the compaction
  delta floor (``delta_floor``) live in a numbered JSON file under
  ``{index}/_manifest/``; every commit writes a temp file and
  RENAMES it to the next sequence number — one atomic FS operation.
  Readers resolve every directory through the highest-numbered
  manifest, so they see the pre-compaction layout or the
  post-compaction layout, never a torn middle.
- **Delta clamping**: readers take only delta partitions with
  ``delta_floor < _batch_id <= hwm``. An epoch that crashed between
  its parquet writes and its manifest commit is invisible (its
  partitions sit above ``hwm``), and partitions already folded into
  a compacted base are never double-counted even before GC removes
  them (they sit at or below ``delta_floor``) — which matters for
  the BM25 tiers whose delta semantics are SUMS, not key sets.
- **Writer fencing**: each ingest epoch commits ``hwm = batch_id``.
  The next epoch must be ``hwm + 1`` (a gap RAISES — a skipped epoch
  means lost data upstream); ``batch_id <= hwm`` is a crash replay
  and becomes a VERIFIED no-op — the epoch recomputes its delta
  frames from the same as-of-``batch_id`` reads and checks them
  against the committed partitions, so a duplicate or misrouted
  delivery carrying DIFFERENT data raises instead of silently
  interleaving. A replay of an epoch at or below ``delta_floor``
  raises outright: its as-of state was folded away by compaction,
  so it cannot be a legitimate crash replay (compaction runs between
  epochs; only the newest epoch can ever be re-delivered).
- **GC is a separate, crash-safe phase**: after the manifest commit,
  superseded base versions and folded delta partitions are deleted
  best-effort. A crash mid-GC leaves unreferenced garbage that the
  NEXT compaction's GC sweeps — readers never resolve to it.

Reference parity note: the reference engine persists index state
through its WAL'd storage tier (graphlite/src/storage — sled trees
with journaled updates); this module is the Spark-native equivalent
for parquet-on-object-store, where the only atomic primitive is a
single-file rename. No code is shared or translated.

Crash-injection hooks: every mutating FS step calls
:func:`_fault_point` first; tests set ``_FAULT_AFTER = n`` to crash
at the *n*-th point, proving every between-two-operations cut leaves
readers consistent (tests/test_index_store.py).
"""

from __future__ import annotations

import json
import re

from pyspark.sql import DataFrame, functions as F

MANIFEST_DIR = "_manifest"
# manifest-log retention: every commit O(1)-trims the file RETAIN
# generations behind it, so the log a reader must list stays bounded
# (~64 small files) no matter how many epochs the index has lived —
# the Delta/Iceberg log-checkpoint concern solved by trimming, since
# old manifests are never read past the one-generation GC window
RETAIN_MANIFESTS = 64

# -- crash injection (tests only) -------------------------------------------
_FAULT_AFTER: "int | None" = None
_ops_seen = 0


class InjectedCrash(RuntimeError):
    """Raised by _fault_point when a test arms _FAULT_AFTER."""


class ManifestConflict(RuntimeError):
    """A manifest commit lost the sequence-number race to another
    writer. The losing writer made no changes; the APPEND path
    recovers with :func:`commit_epoch_with_rebase` (compaction stays
    single-writer and surfaces this to the scheduler)."""


def _fault_point(label: str) -> None:
    global _ops_seen
    if _FAULT_AFTER is None:
        return
    if _ops_seen >= _FAULT_AFTER:
        raise InjectedCrash(label)
    _ops_seen += 1


# -- hadoop fs helpers --------------------------------------------------------

def _fs(spark, path: str):
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    jp = jvm.org.apache.hadoop.fs.Path(path)
    return jvm, jp.getFileSystem(conf)


def _jp(jvm, path: str):
    return jvm.org.apache.hadoop.fs.Path(path)


def _read_small_file(jvm, fs, jpath) -> bytes:
    stream = fs.open(jpath)
    try:
        return bytes(jvm.org.apache.commons.io.IOUtils.toByteArray(stream))
    finally:
        stream.close()


def _write_small_file(fs, jpath, payload: bytes) -> None:
    out = fs.create(jpath, True)
    try:
        out.write(bytearray(payload))
    finally:
        out.close()


# -- manifest log -------------------------------------------------------------

def read_manifest(spark, path: str) -> "dict | None":
    """Highest-numbered committed manifest of the index at ``path``,
    or None for a pre-manifest (legacy) layout. Non-numeric and
    dot-prefixed names (in-flight temp files) are ignored, so a
    writer that crashed before its rename never corrupts reads."""
    jvm, fs = _fs(spark, path)
    mdir = _jp(jvm, f"{path}/{MANIFEST_DIR}")
    if not fs.exists(mdir):
        return None
    best_seq, best = -1, None
    for st in fs.listStatus(mdir):
        name = st.getPath().getName()
        m = re.fullmatch(r"(\d+)\.json", name)
        if m and int(m.group(1)) > best_seq:
            best_seq, best = int(m.group(1)), st.getPath()
    if best is None:
        return None
    return json.loads(_read_small_file(jvm, fs, best).decode("utf-8"))


def _legacy_manifest() -> dict:
    return {"seq": 0, "version": 1, "tiers": {},
            "hwm": None, "delta_floor": None}


def current_manifest(spark, path: str) -> dict:
    """read_manifest with the legacy synthesis: a pre-manifest index
    behaves exactly as before (unversioned dirs, unclamped deltas,
    unfenced epochs) until its first post-upgrade commit."""
    return read_manifest(spark, path) or _legacy_manifest()


def commit_manifest(spark, path: str, manifest: dict) -> None:
    """ONE atomic commit: write ``{seq}.json`` via temp-file + rename.
    The rename is the linearization point — a reader lists either the
    old maximum or the new one, never a partial file. A pre-existing
    target means another writer won the sequence number: RAISE (the
    lost writer made no changes; the APPEND path recovers via
    :func:`commit_epoch_with_rebase`).

    Concurrency caveat (r10 ADVICE): the exists-check-then-rename is
    atomic on HDFS (rename RAISES/returns false on an existing
    destination) but only BEST-EFFORT on filesystems whose rename
    replaces the destination (POSIX rename through
    RawLocalFileSystem; some object-store connectors) — two writers
    racing inside the check→rename window could both believe they
    committed the same seq, losing one commit. Production multi-writer
    deployments should point the index at a filesystem with
    fail-on-existing rename semantics (HDFS, ABFS) or an external
    commit coordinator; the optimistic retry layer narrows the window
    to one FS round-trip but cannot close it on overwriting renames."""
    payload = json.dumps(manifest, sort_keys=True).encode("utf-8")
    jvm, fs = _fs(spark, path)
    seq = int(manifest["seq"])
    final = _jp(jvm, f"{path}/{MANIFEST_DIR}/{seq:020d}.json")
    tmp = _jp(jvm, f"{path}/{MANIFEST_DIR}/.tmp-{seq:020d}.json")
    _fault_point("manifest:write-tmp")
    _write_small_file(fs, tmp, payload)
    _fault_point("manifest:rename")
    if fs.exists(final):
        fs.delete(tmp, False)
        raise ManifestConflict(
            f"concurrent index writer detected: manifest seq {seq} "
            f"already committed at {path} — this writer lost the race "
            f"and made no changes")
    if not fs.rename(tmp, final):
        # a rename refused because the destination appeared inside the
        # exists-check -> rename window (HDFS fail-on-existing
        # semantics) is a LOST RACE, not an I/O failure — it must
        # surface as ManifestConflict so the optimistic append path
        # (commit_epoch_with_rebase) rebases instead of aborting
        fs.delete(tmp, False)
        if fs.exists(final):
            raise ManifestConflict(
                f"concurrent index writer detected: manifest seq "
                f"{seq} already committed at {path} — this writer "
                f"lost the race inside the commit window and made "
                f"no changes")
        raise RuntimeError(
            f"manifest commit rename failed for seq {seq} at {path}")
    # O(1) log trim: no listing — delete exactly the file RETAIN
    # generations back (crash-stranded stragglers are swept by the
    # compaction-time gc_index pass)
    old_seq = seq - RETAIN_MANIFESTS
    if old_seq > 0:
        stale = _jp(jvm, f"{path}/{MANIFEST_DIR}/{old_seq:020d}.json")
        if fs.exists(stale):
            fs.delete(stale, False)


def reset_manifest(spark, path: str, tiers: "list[str]",
                   delta_tiers: "list[str] | None" = None) -> None:
    """(Re)build-time reset: drop any previous manifest log and delta
    directories, then commit seq 1 pointing at the conventional
    (unversioned) tier dir names. Build is not the atomic-swap
    surface — a crash mid-build means rebuilding — but a rebuild over
    a previously MAINTAINED index must not resurrect its stale
    deltas."""
    jvm, fs = _fs(spark, path)
    mdir = _jp(jvm, f"{path}/{MANIFEST_DIR}")
    if fs.exists(mdir):
        fs.delete(mdir, True)
    sdir = _jp(jvm, f"{path}/.stage")
    if fs.exists(sdir):
        fs.delete(sdir, True)
    for t in (delta_tiers if delta_tiers is not None else tiers):
        d = _jp(jvm, f"{path}/{t}_delta")
        if fs.exists(d):
            fs.delete(d, True)
    root = _jp(jvm, path)
    if fs.exists(root):
        for st in fs.listStatus(root):
            name = st.getPath().getName()
            if any(re.fullmatch(re.escape(t) + r"_v\d+", name)
                   for t in tiers):
                fs.delete(st.getPath(), True)
    commit_manifest(spark, path, {
        "seq": 1, "version": 1, "tiers": {t: t for t in tiers},
        "hwm": None, "delta_floor": None,
    })


# -- tier resolution + reads --------------------------------------------------

def tier_dir(path: str, manifest: dict, tier: str) -> str:
    """Live base directory for a tier — the manifest's mapping, or
    the conventional name for legacy/unlisted tiers."""
    return f"{path}/{manifest.get('tiers', {}).get(tier, tier)}"


def read_base(spark, path: str, tier: str,
              manifest: "dict | None" = None) -> DataFrame:
    m = manifest if manifest is not None else current_manifest(spark, path)
    return spark.read.parquet(tier_dir(path, m, tier))


def read_meta_row(spark, path: str, tier: str = "meta",
                  manifest: "dict | None" = None):
    """The one-row PARAMETER frame of a persisted index (banding
    config, quantizer shape, ...), read DRIVER-SIDE via a pyarrow
    footer read when the directory is on the local filesystem — no
    Spark job, where the ``spark.read.parquet(...).collect()`` form
    costs ~0.3 s of fixed job latency on EVERY against-index call.
    Resolves the directory through the manifest mapping exactly like
    :func:`read_base` (a versioned meta tier reads the LIVE
    generation); any pyarrow-path surprise falls back to the Spark
    read, which stays the remote-filesystem (HDFS/S3) path."""
    m = manifest if manifest is not None else current_manifest(spark, path)
    d = tier_dir(path, m, tier)
    local = re.sub(r"^file:(//)?", "", d)
    if "://" not in local:
        try:
            import glob
            import os

            import pyarrow.parquet as pq

            for f in sorted(glob.glob(os.path.join(local, "*.parquet"))):
                t = pq.read_table(f)
                if t.num_rows:
                    return _MetaRow({
                        c: t.column(c)[0].as_py() for c in t.column_names})
        except Exception:
            pass  # fall through to the authoritative Spark read
    return spark.read.parquet(d).collect()[0]


class _MetaRow(dict):
    """Row stand-in for driver-side meta reads: supports BOTH the
    ``row.field`` and ``row['field']`` access the callers use (a Spark
    ``Row`` supports both; plain dicts only the latter)."""

    def __getattr__(self, name: str):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e


def read_delta(spark, path: str, tier: str,
               manifest: "dict | None" = None,
               before_batch: "int | None" = None,
               at_batch: "int | None" = None) -> "DataFrame | None":
    """The tier's delta partitions visible under the manifest's
    clamps: ``delta_floor < _batch_id <= hwm`` plus the caller's
    as-of bound (``before_batch`` excludes the epoch's own keys
    during ingest; ``at_batch`` isolates one committed epoch for
    replay verification). None when no delta rows are visible."""
    m = manifest if manifest is not None else current_manifest(spark, path)
    jvm, fs = _fs(spark, path)
    ddir = f"{path}/{tier}_delta"
    if not fs.exists(_jp(jvm, ddir)):
        return None
    # ONLY the all-empty-epoch case reads as "no deltas": a delta dir
    # whose every partition was an empty write has no footer to infer
    # a schema from. Anything else (corrupt footer, permission
    # failure) must surface — for the dedup index a swallowed error
    # would mean silently missed duplicates, for BM25 under-counted
    # df/stats (r10 ADVICE). The classification lives in ONE place
    # (_read_parquet_or_none).
    delta = _read_parquet_or_none(spark, ddir)
    if delta is None:
        return None
    floor, hwm = m.get("delta_floor"), m.get("hwm")
    if hwm is None and int(m.get("seq", 0)) >= 1:
        # a COMMITTED manifest with no high-water mark means no epoch
        # has ever been committed: every delta partition present is an
        # uncommitted (crashed-before-commit) write and must stay
        # invisible — also what makes an as-of read at the pre-epoch
        # manifest answer "no deltas" instead of leaking later epochs.
        # (Only the synthetic seq-0 LEGACY manifest reads unclamped.)
        return None
    if floor is not None:
        delta = delta.filter(F.col("_batch_id") > int(floor))
    if hwm is not None:
        delta = delta.filter(F.col("_batch_id") <= int(hwm))
    if before_batch is not None:
        delta = delta.filter(F.col("_batch_id") < int(before_batch))
    if at_batch is not None:
        delta = delta.filter(F.col("_batch_id") == int(at_batch))
    return delta


def read_tier(spark, path: str, tier: str,
              before_batch: "int | None" = None,
              manifest: "dict | None" = None,
              as_of_seq: "int | None" = None) -> DataFrame:
    """base ∪ visible deltas, projected to the base's columns — the
    one read every against-index query and ingest epoch uses.

    ``as_of_seq``: TIME TRAVEL — resolve through the manifest at that
    sequence number instead of the newest one, answering exactly as a
    reader at that commit saw the index (the reproducibility story
    for training-data lineage: re-run epoch k's dedup decision months
    later). The manifest log retains RETAIN_MANIFESTS generations and
    GC keeps one superseded base generation, so snapshots survive one
    compaction back; older snapshots RAISE a clear retention error
    instead of silently answering from a partial layout."""
    if as_of_seq is not None:
        if manifest is not None:
            raise ValueError("pass either manifest= or as_of_seq=, "
                             "not both")
        manifest = manifest_at(spark, path, as_of_seq)
        _check_snapshot_readable(spark, path, tier, manifest, as_of_seq)
    m = manifest if manifest is not None else current_manifest(spark, path)
    base = read_base(spark, path, tier, m)
    delta = read_delta(spark, path, tier, m, before_batch=before_batch)
    if delta is None:
        return base
    return base.unionByName(delta.select(*base.columns))


def manifest_at(spark, path: str, seq: int) -> dict:
    """The committed manifest at an exact sequence number, for
    snapshot reads. Raises when the generation was trimmed past the
    retention window (or never existed)."""
    m = _manifest_at(spark, path, int(seq))
    if m is None:
        raise ValueError(
            f"no manifest seq {int(seq)} at {path}: never committed, "
            f"or trimmed past the {RETAIN_MANIFESTS}-generation "
            f"manifest-log retention window")
    return m


def versions(spark, path: str) -> "list[dict]":
    """The retained manifest generations of an index, oldest first:
    ``[{'seq', 'version', 'hwm', 'delta_floor'}]`` — the audit
    listing for time travel (pick a seq, read with ``as_of_seq=``).
    Empty for a pre-manifest (legacy) index."""
    jvm, fs = _fs(spark, path)
    mdir = _jp(jvm, f"{path}/{MANIFEST_DIR}")
    if not fs.exists(mdir):
        return []
    out = []
    for st in fs.listStatus(mdir):
        mm = re.fullmatch(r"(\d+)\.json", st.getPath().getName())
        if not mm:
            continue
        man = json.loads(
            _read_small_file(jvm, fs, st.getPath()).decode("utf-8"))
        out.append({"seq": int(man.get("seq", int(mm.group(1)))),
                    "version": man.get("version"),
                    "hwm": man.get("hwm"),
                    "delta_floor": man.get("delta_floor")})
    return sorted(out, key=lambda r: r["seq"])


def _delta_epochs_present(spark, path: str, tier: str) -> "set[int]":
    """Batch ids with a partition directory under ``{tier}_delta`` —
    ONE directory listing, not one existence RPC per epoch."""
    jvm, fs = _fs(spark, path)
    ddir = _jp(jvm, f"{path}/{tier}_delta")
    if not fs.exists(ddir):
        return set()
    out = set()
    for st in fs.listStatus(ddir):
        mm = re.fullmatch(r"_batch_id=(\d+)", st.getPath().getName())
        if mm:
            out.add(int(mm.group(1)))
    return out


def _check_snapshot_readable(spark, path: str, tier: str,
                             old: dict, seq: int) -> None:
    """Refuse an as-of read whose layout was garbage-collected: the
    snapshot's base dir must still exist, and every delta epoch the
    snapshot needs (``old.delta_floor < b <= old.hwm``) that a later
    compaction has folded (``b <= current delta_floor``) must still
    have its partition directory. A missing directory ABOVE the
    current floor is legitimate — an epoch that published no rows for
    this tier (dedup with ``near=False`` never writes bands) simply
    has no partition; GC only ever removes directories at or below a
    committed compaction floor. Erring toward a raise on genuinely
    collected epochs is the right failure mode for an auditor —
    never answer from a provably partial layout."""
    jvm, fs = _fs(spark, path)
    bdir = tier_dir(path, old, tier)
    if not fs.exists(_jp(jvm, bdir)):
        raise ValueError(
            f"snapshot seq {int(seq)} of {path} is outside the GC "
            f"retention window: its '{tier}' base ({bdir}) was "
            f"collected by a later compaction (GC keeps one "
            f"superseded generation)")
    hwm = old.get("hwm")
    if hwm is None:
        return
    floor = int(old.get("delta_floor") or 0)
    cur_floor = int((read_manifest(spark, path)
                     or {}).get("delta_floor") or 0)
    present = _delta_epochs_present(spark, path, tier)
    for b in range(floor + 1, int(hwm) + 1):
        if b not in present and b <= cur_floor:
            raise ValueError(
                f"snapshot seq {int(seq)} of {path} is outside the GC "
                f"retention window: delta epoch {b} of '{tier}' "
                f"(needed for delta_floor={floor} < b <= hwm={hwm}) "
                f"was folded and collected by a later compaction")


def tier_changes(spark, path: str, tier: str, from_seq: int,
                 to_seq: "int | None" = None,
                 on_folded: str = "raise") -> DataFrame:
    """CHANGELOG (CDC) read over the manifest log: the rows a tier
    gained between manifest ``from_seq`` (exclusive) and ``to_seq``
    (inclusive; default the newest commit) — the incremental feed a
    downstream consumer uses to stay in sync with a maintained index
    without re-reading it (``SELECT * FROM changes WHERE _batch_id
    > last_seen`` instead of a full-snapshot diff every day).

    Fast path: because every ingest epoch lands as its own
    ``_batch_id={b}`` delta partition, the change set IS the delta
    partitions with ``hwm(from) < _batch_id <= hwm(to)`` — a
    directory-pruned read of exactly the changed epochs, O(changes)
    however large the index base. For the key-set families (dedup
    exact/bands, ANN ids) those rows are precisely the ADDED keys
    (epoch survivors are anti-joined against the prior index, so
    delta partitions are disjoint from the base and each other); for
    the SUM-mergeable BM25 tiers they are the per-epoch posting/stat
    INCREMENTS — in both cases the row a consumer should apply.

    When a compaction between the two snapshots has folded part of
    the requested range into the base (``delta_floor(to) >=`` a
    needed epoch) the fast path cannot answer; ``on_folded='raise'``
    (default) raises a retention-style error, ``on_folded='diff'``
    falls back to an as-of snapshot set-difference
    (``to ∖ from``, with ``_batch_id`` null — valid ONLY for
    set-semantics tiers; a SUM tier's snapshot diff is not a row
    changelog, so BM25 consumers must keep their lag inside the
    compaction cadence). Returns the delta partitions' columns plus
    ``_batch_id`` — usually the base schema, but a tier whose epochs
    append a different row shape (the ANN meta tier's per-epoch
    counts) keeps its delta shape.
    """
    if on_folded not in ("raise", "diff"):
        raise ValueError(
            f"on_folded must be 'raise' or 'diff', got {on_folded!r}")
    if read_manifest(spark, path) is None:
        raise ValueError(
            f"no manifest log at {path}: a legacy (pre-manifest) "
            f"index has no commit history to read changes from")
    m_to = (manifest_at(spark, path, int(to_seq))
            if to_seq is not None else current_manifest(spark, path))
    m_from = manifest_at(spark, path, int(from_seq))
    if int(m_from["seq"]) > int(m_to["seq"]):
        raise ValueError(
            f"from_seq {int(m_from['seq'])} is newer than to_seq "
            f"{int(m_to['seq'])} at {path}")
    base_cols = read_base(spark, path, tier, m_to).columns
    from_hwm = m_from.get("hwm")
    to_hwm = m_to.get("hwm")
    # the changelog's schema is the DELTA partitions' schema (the
    # rows epochs actually append) — usually the base's columns, but
    # a tier with heterogeneous epoch rows (the ANN meta tier's
    # per-epoch counts vs its 1-row base) keeps its delta shape
    delta = read_delta(spark, path, tier, m_to)

    def _empty() -> DataFrame:
        if delta is not None:
            cols = ([c for c in delta.columns if c != "_batch_id"]
                    + ["_batch_id"])
            return delta.select(*cols).limit(0)
        return (read_base(spark, path, tier, m_to)
                .withColumn("_batch_id", F.lit(None).cast("long"))
                .select(*(base_cols + ["_batch_id"])).limit(0))

    if to_hwm is None or (from_hwm is not None
                          and int(to_hwm) <= int(from_hwm)):
        # append-only store: same hwm (even across a compaction)
        # means no rows changed
        return _empty()
    lo = int(from_hwm) if from_hwm is not None else 0
    floor_to = m_to.get("delta_floor")
    folded = floor_to is not None and lo + 1 <= int(floor_to)
    if not folded:
        # a compaction PAST m_to may have folded+GC'd partitions m_to
        # still considered visible — verify every needed epoch whose
        # id a later compaction could have collected (b <= the CURRENT
        # floor) still has its directory. Missing directories above
        # the current floor are epochs that never published rows for
        # this tier (near=False ingests never write bands) — the fast
        # path correctly reads nothing for them. One listing, not one
        # RPC per epoch.
        cur_floor = int((read_manifest(spark, path)
                         or {}).get("delta_floor") or 0)
        if cur_floor > lo:
            present = _delta_epochs_present(spark, path, tier)
            for b in range(lo + 1, min(int(to_hwm), cur_floor) + 1):
                if b not in present:
                    folded = True
                    break
    if folded:
        if on_folded == "raise":
            raise ValueError(
                f"changes ({int(m_from['seq'])}, {int(m_to['seq'])}] "
                f"of '{tier}' at {path} include epochs already folded "
                f"into a compacted base (delta_floor="
                f"{m_to.get('delta_floor')}, needed > {lo}) — read "
                f"before the compaction cadence, or pass "
                f"on_folded='diff' for a set-semantics snapshot diff")
        new = read_tier(spark, path, tier,
                        as_of_seq=(int(to_seq) if to_seq is not None
                                   else int(m_to["seq"])))
        old = read_tier(spark, path, tier,
                        as_of_seq=int(m_from["seq"]))
        return (new.select(*base_cols).exceptAll(old.select(*base_cols))
                .withColumn("_batch_id", F.lit(None).cast("long"))
                .select(*(base_cols + ["_batch_id"])))
    if delta is None:
        return _empty()
    cols = ([c for c in delta.columns if c != "_batch_id"]
            + ["_batch_id"])
    return (delta.filter(F.col("_batch_id") > lo)
            .select(*cols))


def describe_index(spark, path: str) -> dict:
    """Filesystem-only operational summary of a persisted index — no
    data scan: the live manifest (seq/version/hwm/delta_floor), the
    retained time-travel window, and per-tier layout (live base dir,
    base bytes/files, delta epochs present with bytes) straight from
    directory listings. The ops surface for 'how big is this index,
    how far behind is compaction, which snapshots can I still read'.
    """
    jvm, fs = _fs(spark, path)
    m = current_manifest(spark, path)
    vs = versions(spark, path)
    tiers: dict = {}
    root = _jp(jvm, path)
    known = dict(m.get("tiers", {}))
    if not known and fs.exists(root):
        # legacy index: every non-delta, non-manifest dir is a tier
        for st in fs.listStatus(root):
            name = st.getPath().getName()
            if (st.isDirectory() and name != MANIFEST_DIR
                    and not name.endswith("_delta")
                    and not name.startswith(".")):
                known[name] = name
    for t, live in sorted(known.items()):
        info: dict = {"base_dir": live}
        bdir = _jp(jvm, f"{path}/{live}")
        if fs.exists(bdir):
            cs = fs.getContentSummary(bdir)
            info["base_bytes"] = int(cs.getLength())
            info["base_files"] = int(cs.getFileCount())
        ddir = _jp(jvm, f"{path}/{t}_delta")
        epochs = []
        if fs.exists(ddir):
            for st in fs.listStatus(ddir):
                mm = re.fullmatch(r"_batch_id=(\d+)",
                                  st.getPath().getName())
                if mm:
                    epochs.append(int(mm.group(1)))
            cs = fs.getContentSummary(ddir)
            info["delta_bytes"] = int(cs.getLength())
        info["delta_epochs"] = sorted(epochs)
        tiers[t] = info
    return {
        "path": path,
        "seq": int(m.get("seq", 0)),
        "version": m.get("version"),
        "hwm": m.get("hwm"),
        "delta_floor": m.get("delta_floor"),
        "retained_seqs": [v["seq"] for v in vs],
        "tiers": tiers,
    }


def sync_index(spark, src: str, dst: str,
               extra_dirs: "tuple[str, ...]" = ("meta",)) -> dict:
    """Incrementally REPLICATE a maintained index by shipping its
    changelog — the cross-region/DR mirror story: after the one-time
    bootstrap, each sync moves only the delta epochs the destination
    hasn't seen (O(changes), never the base), and the mirror is a
    full first-class index (fenced epochs, its own manifest log,
    independently compactable, time-travelable, queryable by every
    against-index read).

    Bootstrap (no manifest at ``dst``): copy each live tier base (and
    the conventional side dirs in ``extra_dirs`` — the dedup/BM25
    ``meta`` parameters) and commit manifest seq 1 with
    ``hwm = delta_floor = src.delta_floor`` — exactly the state of a
    local index whose epochs up to the source's compaction floor were
    folded into its base.

    Incremental: committed source epochs ``dst.hwm+1 .. src.hwm``
    re-publish through the destination's OWN stage+rename +
    fence + optimistic commit path, so a crashed sync replays as a
    verified no-op (identical staged content is adopted) and a
    corrupted re-ship raises before any commit. A destination that
    lagged past the source's compaction cadence (``src.delta_floor``
    at or above the next needed epoch — the partitions were folded
    and GC'd) RAISES: re-bootstrap into a fresh directory.

    Returns ``{'bootstrapped', 'applied': [batch ids], 'hwm'}``.
    """
    src_m = read_manifest(spark, src)
    if src_m is None:
        raise ValueError(
            f"no manifest log at {src}: a legacy (pre-manifest) index "
            f"has no commit history to sync from")
    tiers = sorted(src_m.get("tiers", {}))
    if not tiers:
        raise ValueError(f"source manifest at {src} lists no tiers")
    jvm, fs = _fs(spark, src)
    dst_m = read_manifest(spark, dst)
    bootstrapped = False
    if dst_m is None:
        # byte-identical FILE copy of each live base (FileUtil), not a
        # Spark rewrite: the source's key-range layout and file sizing
        # (pushdown file skipping) carry over to the mirror verbatim.
        # No manifest exists at dst yet, so no reader can observe the
        # copy in progress; dirs left by a crashed bootstrap are
        # removed first (FileUtil.copy would nest into them).
        conf = spark.sparkContext._jsc.hadoopConfiguration()
        futil = jvm.org.apache.hadoop.fs.FileUtil
        dfs = _fs(spark, dst)[1]
        copies = [(tier_dir(src, src_m, t), f"{dst}/{t}")
                  for t in tiers]
        copies += [(f"{src}/{d}", f"{dst}/{d}") for d in extra_dirs
                   if fs.exists(_jp(jvm, f"{src}/{d}"))]
        for sdir, ddirc in copies:
            dpath = _jp(jvm, ddirc)
            if dfs.exists(dpath):
                dfs.delete(dpath, True)
            if not futil.copy(fs, _jp(jvm, sdir), dfs, dpath,
                              False, conf):
                raise RuntimeError(
                    f"bootstrap copy {sdir} -> {ddirc} failed")
        floor = src_m.get("delta_floor")
        dst_m = {"seq": 1, "version": 1, "tiers": {t: t for t in tiers},
                 "hwm": floor, "delta_floor": floor}
        commit_manifest(spark, dst, dst_m)
        bootstrapped = True
    src_hwm = src_m.get("hwm")
    dst_hwm = dst_m.get("hwm")
    applied: "list[int]" = []
    if src_hwm is not None and (dst_hwm is None
                                or int(dst_hwm) < int(src_hwm)):
        nxt = int(dst_hwm) + 1 if dst_hwm is not None else 1
        src_floor = int(src_m.get("delta_floor") or 0)
        if nxt <= src_floor:
            raise ValueError(
                f"mirror at {dst} (hwm={dst_hwm}) lagged past the "
                f"source's compaction cadence: epochs from {nxt} were "
                f"folded into {src}'s base (delta_floor={src_floor}) "
                f"and their partitions collected — re-bootstrap the "
                f"mirror into a fresh directory")
        for b in range(nxt, int(src_hwm) + 1):
            _mode, man = fence_epoch(spark, dst, b)
            for t in tiers:
                if not fs.exists(
                        _jp(jvm, f"{src}/{t}_delta/_batch_id={b}")):
                    continue
                d = read_delta(spark, src, t, src_m, at_batch=b)
                if d is None:
                    continue
                publish_delta(spark, dst, t, d.drop("_batch_id"), b)
            commit_epoch_with_rebase(spark, dst, b, man)
            applied.append(b)
    final = current_manifest(spark, dst)
    return {"bootstrapped": bootstrapped, "applied": applied,
            "hwm": final.get("hwm")}


# -- epoch fencing ------------------------------------------------------------

def fence_epoch(spark, path: str, batch_id: int) -> "tuple[str, dict]":
    """Admission control for one ingest epoch. Returns
    ``('run', manifest)`` for the next contiguous epoch (or any epoch
    on a never-maintained index), ``('replay', manifest)`` for a
    committed epoch being re-delivered (caller must verify, not
    write), and RAISES on a gap or on a replay older than the
    compaction floor."""
    m = current_manifest(spark, path)
    hwm, floor = m.get("hwm"), m.get("delta_floor")
    b = int(batch_id)
    if hwm is None or b == int(hwm) + 1:
        return "run", m
    if b > int(hwm) + 1:
        raise ValueError(
            f"epoch gap at {path}: committed high-water mark is {hwm} "
            f"but batch_id={b} arrived; epochs must be contiguous — a "
            f"skipped epoch means data was lost upstream of the index")
    if floor is not None and b <= int(floor):
        raise ValueError(
            f"batch_id={b} replays an epoch already folded into the "
            f"compacted base (delta_floor={floor}) of {path}; its "
            f"as-of state no longer exists, so this cannot be a crash "
            f"replay of the newest epoch — misrouted or duplicate "
            f"delivery")
    return "replay", m


def commit_epoch(spark, path: str, batch_id: int, manifest: dict) -> None:
    """Publish one ingest epoch: bump hwm to batch_id in a new
    manifest commit. Runs AFTER the epoch's delta parquet writes, so
    a crash in between leaves the partitions invisible (above hwm)
    and the replay re-runs as a normal 'run' epoch."""
    m2 = dict(manifest)
    m2["seq"] = int(manifest.get("seq", 0)) + 1
    m2["hwm"] = int(batch_id)
    m2.setdefault("version", 1)
    m2.setdefault("tiers", {})
    m2.setdefault("delta_floor", None)
    commit_manifest(spark, path, m2)


def _multiset_diff_count(a: DataFrame, b: DataFrame) -> int:
    """Number of distinct row values whose multiplicities differ
    between the two frames — 0 iff they are multiset-equal (null-safe
    grouping, the same row equality ``exceptAll`` uses). ONE action,
    each side evaluated exactly once: the naive
    ``a.exceptAll(b).count() + b.exceptAll(a).count()`` form costs two
    actions and evaluates each frame twice — and the recomputed side
    of a replay verification is a whole ingest chain."""
    cols = list(a.columns)
    tagged = (
        a.withColumn("_vtag", F.lit(1))
        .unionByName(b.select(*cols).withColumn("_vtag", F.lit(-1)))
    )
    return (
        tagged.groupBy(*cols)
        .agg(F.sum("_vtag").alias("_vsum"))
        .filter(F.col("_vsum") != 0)
        .count()
    )


def verify_replay(persisted: "DataFrame | None", recomputed: DataFrame,
                  path: str, tier: str, batch_id: int) -> None:
    """The 'verified' in verified no-op: a re-delivered epoch's
    recomputed delta frame must equal the committed partition as a
    multiset. Deterministic ingest makes a true crash replay pass
    bit-identically; a duplicate batch_id carrying different data
    (two schedulers, a misrouted queue) fails loudly here instead of
    silently interleaving."""
    if persisted is None:
        extra = recomputed.count()
        if extra:
            raise ValueError(
                f"replay verification failed for epoch {batch_id} of "
                f"{path}/{tier}: the committed epoch wrote no keys but "
                f"the re-delivered batch derives {extra} — different "
                f"data under a committed batch_id")
        return
    a = persisted.select(*recomputed.columns)
    diff = _multiset_diff_count(a, recomputed)
    if diff:
        raise ValueError(
            f"replay verification failed for epoch {batch_id} of "
            f"{path}/{tier}: {diff} distinct rows differ between the "
            f"committed partition and the re-delivered batch's "
            f"recomputation — different data under a committed batch_id")


# -- staged delta publish + optimistic append commits -------------------------

def _read_parquet_or_none(spark, d: str) -> "DataFrame | None":
    """spark.read.parquet that treats ONLY the no-footer/empty-dir
    case as 'no rows' (the read_delta rule) and re-raises everything
    else."""
    try:
        return spark.read.parquet(d)
    except Exception as e:
        msg = str(e)
        if ("Unable to infer schema" in msg
                or "Path does not exist" in msg
                or "PATH_NOT_FOUND" in msg
                or "UNABLE_TO_INFER_SCHEMA" in msg):
            return None
        raise


def _verify_same_partition(spark, staged: str, dest: str,
                           path: str, tier: str, batch_id: int) -> None:
    """Multiset-compare a staged epoch write against an already
    present partition for the same batch_id. Equality means the
    existing partition is adoptable (our own crashed attempt, or a
    concurrent writer that derived the identical delta — ingest is
    deterministic by contract); inequality is either a concurrent
    writer carrying DIFFERENT data or broken determinism upstream,
    and both must fail loudly BEFORE any manifest commit."""
    a = _read_parquet_or_none(spark, staged)
    b = _read_parquet_or_none(spark, dest)
    if a is None and b is None:
        return
    if a is None or b is None:
        only = dest if a is None else staged
        n = (b if a is None else a).count()
        if n == 0:
            return
        raise ValueError(
            f"conflicting delta partition for epoch {batch_id} of "
            f"{path}/{tier}: {only} carries {n} rows where the other "
            f"write is empty — different data under one batch_id "
            f"(concurrent writer or non-deterministic recomputation)")
    cols = sorted(a.columns)
    x, y = a.select(*cols), b.select(*cols)
    diff = _multiset_diff_count(x, y)
    if diff:
        raise ValueError(
            f"conflicting delta partition for epoch {batch_id} of "
            f"{path}/{tier}: {diff} distinct rows differ between the "
            f"staged write and the partition already present — "
            f"different data under one batch_id (concurrent writer or "
            f"non-deterministic recomputation); refusing to publish")


def publish_delta(spark, path: str, tier: str, df: DataFrame,
                  batch_id: int) -> None:
    """Publish one epoch's delta rows for a tier via STAGE + RENAME:
    write to a writer-unique staging directory, then rename it into
    ``{tier}_delta/_batch_id={k}`` — the partition appears to readers
    complete or not at all, and a second writer's files can never
    interleave into a partition another writer is about to commit
    (the hazard of the previous dynamic-partition-overwrite append:
    a racing same-batch writer silently replaced the winner's rows).

    If the destination partition already exists it is verified
    multiset-equal to the staged write and ADOPTED (our own crashed
    previous attempt — partitions above hwm are invisible until the
    manifest commit — or a concurrent writer that derived the same
    delta); different content RAISES before any commit. Pass ``df``
    already shaped (sortWithinPartitions/coalesce) — this function
    only stages and renames."""
    import uuid

    jvm, fs = _fs(spark, path)
    b = int(batch_id)
    ddir = f"{path}/{tier}_delta"
    dest_s = f"{ddir}/_batch_id={b}"
    dest = _jp(jvm, dest_s)
    stage_name = f"{tier}-{b}-{uuid.uuid4().hex[:12]}"
    stage = f"{path}/.stage/{stage_name}"
    _fault_point(f"publish:stage:{tier}")
    df.write.parquet(stage)
    sp = _jp(jvm, stage)
    recover_s = None
    try:
        if fs.exists(dest):
            _verify_same_partition(spark, stage, dest_s, path, tier, b)
            return
        fs.mkdirs(_jp(jvm, ddir))
        _fault_point(f"publish:rename:{tier}")
        if not fs.rename(sp, dest):
            # lost a same-batch race inside the probe->rename window
            # (fail-on-existing rename semantics): verify and adopt
            _verify_same_partition(spark, stage, dest_s, path, tier, b)
            return
        # Hadoop rename does NOT fail when the destination directory
        # appeared inside the probe->rename window — it moves the
        # source INTO it and returns true, silently nesting this
        # writer's files inside the winner's partition. Detect the
        # nesting, pull the staged write back out, and run the same
        # verify-and-adopt protocol the fail-fast path uses.
        nested_s = f"{dest_s}/{stage_name}"
        nested = _jp(jvm, nested_s)
        if fs.exists(nested):
            recover_s = f"{path}/.stage/{stage_name}-recover"
            if not fs.rename(nested, _jp(jvm, recover_s)):
                raise RuntimeError(
                    f"could not extract nested stage {nested_s} after "
                    f"a lost same-batch publish race at {path}")
            _verify_same_partition(spark, recover_s, dest_s, path,
                                   tier, b)
    finally:
        if fs.exists(sp):
            fs.delete(sp, True)
        if recover_s is not None:
            rp = _jp(jvm, recover_s)
            if fs.exists(rp):
                fs.delete(rp, True)


def commit_epoch_with_rebase(spark, path: str, batch_id: int,
                             manifest: dict,
                             max_retries: int = 8) -> str:
    """Optimistic append commit (the Delta/Iceberg
    commit-retry-with-rebase posture, APPEND path only — compaction
    stays single-writer): try commit_epoch; when another writer wins
    the manifest sequence number, re-read the log, re-fence, and
    retry on top of the interloper's commit instead of aborting.

    Outcomes:
    - ``'committed'`` — this writer's manifest commit published the
      epoch (possibly after rebasing past interleaved commits such as
      a concurrent compaction or another writer's DISJOINT epoch —
      the manifest log serializes the order).
    - ``'duplicate'`` — a concurrent writer committed THIS batch_id
      first. Safe to treat as success: publish_delta already verified
      the committed partition carries exactly this writer's rows
      (different data under one batch_id raises there, before any
      commit).
    - RAISES on an epoch gap, on a replay below the compaction floor
      (fence_epoch rules re-applied against each rebased manifest),
      or after ``max_retries`` consecutive lost races."""
    m = dict(manifest)
    b = int(batch_id)
    for _ in range(int(max_retries) + 1):
        try:
            commit_epoch(spark, path, b, m)
            return "committed"
        except ManifestConflict:
            m2 = current_manifest(spark, path)
            hwm, floor = m2.get("hwm"), m2.get("delta_floor")
            if hwm is not None and int(hwm) >= b:
                if floor is not None and b <= int(floor):
                    raise ValueError(
                        f"batch_id={b} at {path} was committed AND "
                        f"folded below the compaction floor ({floor}) "
                        f"while this writer raced — misrouted or "
                        f"grossly delayed delivery")
                return "duplicate"
            if hwm is not None and b > int(hwm) + 1:
                raise ValueError(
                    f"epoch gap appeared at {path} while rebasing: "
                    f"high-water mark moved to {hwm} but batch_id={b} "
                    f"needs {int(hwm) + 1} committed first")
            m = m2
    raise RuntimeError(
        f"commit_epoch_with_rebase gave up after {max_retries} lost "
        f"manifest races at {path} (batch_id={b}) — pathological "
        f"contention; serialize the writers")


# -- compaction commit + GC ---------------------------------------------------

def commit_compaction(spark, path: str, new_tiers: "dict[str, str]",
                      manifest: dict) -> dict:
    """Publish a compaction: new base dirs + delta_floor = hwm in ONE
    manifest commit. Everything before this call only ADDED files
    (the _v{n} bases); everything after only removes garbage — so a
    crash at any point leaves every reader on a complete layout."""
    m2 = dict(manifest)
    m2["seq"] = int(manifest.get("seq", 0)) + 1
    m2["version"] = int(manifest.get("version", 1)) + 1
    tiers = dict(manifest.get("tiers", {}))
    tiers.update(new_tiers)
    m2["tiers"] = tiers
    m2["hwm"] = manifest.get("hwm")
    m2["delta_floor"] = manifest.get("hwm")
    commit_manifest(spark, path, m2)
    return m2


def _manifest_at(spark, path: str, seq: int) -> "dict | None":
    jvm, fs = _fs(spark, path)
    jp = _jp(jvm, f"{path}/{MANIFEST_DIR}/{int(seq):020d}.json")
    if not fs.exists(jp):
        return None
    return json.loads(_read_small_file(jvm, fs, jp).decode("utf-8"))


def gc_index(spark, path: str, manifest: dict, tiers: "list[str]",
             delta_tiers: "list[str] | None" = None) -> None:
    """Best-effort post-commit garbage collection with ONE-GENERATION
    RETENTION: delete base versions and folded delta partitions only
    once they are superseded by at least TWO manifest commits. A
    reader that resolved the previous manifest and is still executing
    its plan when this compaction commits keeps every file it can
    reference (the Delta/Iceberg snapshot-retention posture; found by
    the reader-racing-compaction pytest — immediate GC yanked the old
    base out from under an in-flight scan). Readers more than one
    generation behind are outside the retention window, the standard
    bounded contract.

    Self-healing: the base sweep works by PATTERN against the live +
    previous manifests, not by remembering what the last compaction
    left, so garbage stranded by a crash mid-GC is collected by the
    next run. Never deletes anything a reader holding the current or
    previous manifest can reach."""
    jvm, fs = _fs(spark, path)
    prev = (_manifest_at(spark, path, int(manifest.get("seq", 1)) - 1)
            if int(manifest.get("seq", 1)) > 1 else None)
    keep = {manifest.get("tiers", {}).get(t, t) for t in tiers}
    if prev is not None:
        keep |= {prev.get("tiers", {}).get(t, t) for t in tiers}
    else:
        # a legacy (pre-manifest) index's FIRST compaction has no
        # previous manifest file, but a reader that resolved the legacy
        # layout mid-scan holds the CONVENTIONAL tier names — keep them
        # one more generation so the retention contract ("never delete
        # what a reader holding the current or previous manifest can
        # reach") also covers the upgrade commit (r10 ADVICE)
        keep |= set(tiers)
    root = _jp(jvm, path)
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        for t in tiers:
            if name in keep:
                continue
            if name == t or re.fullmatch(re.escape(t) + r"_v\d+", name):
                _fault_point(f"gc:base:{name}")
                fs.delete(st.getPath(), True)
                break
    # delta partitions: a reader on the PREVIOUS manifest still needs
    # (prev.delta_floor, prev.hwm] — only epochs already folded as of
    # that manifest are collectable
    # manifest-log sweep: collect stragglers the per-commit O(1) trim
    # missed (crashes between rename and trim) — everything more than
    # RETAIN_MANIFESTS generations old
    mdir = _jp(jvm, f"{path}/{MANIFEST_DIR}")
    if fs.exists(mdir):
        cutoff = int(manifest.get("seq", 1)) - RETAIN_MANIFESTS
        for st in fs.listStatus(mdir):
            m = re.fullmatch(r"(\d+)\.json", st.getPath().getName())
            if m and int(m.group(1)) <= cutoff:
                fs.delete(st.getPath(), False)
    floor = manifest.get("delta_floor")
    prev_floor = prev.get("delta_floor") if prev is not None else None
    if floor is None or prev_floor is None:
        return
    del_floor = min(int(floor), int(prev_floor))
    # stranded staging dirs (publish_delta crashed between its write
    # and rename): only epochs at/below the collectable floor can be
    # swept — fence_epoch raises for those batch ids before any stage
    # write, so nothing down there can still be in flight
    sdir = _jp(jvm, f"{path}/.stage")
    if fs.exists(sdir):
        for st in fs.listStatus(sdir):
            m = re.fullmatch(r".+-(\d+)-[0-9a-f]+",
                             st.getPath().getName())
            if m and int(m.group(1)) <= del_floor:
                fs.delete(st.getPath(), True)
    for t in (delta_tiers if delta_tiers is not None else tiers):
        ddir = _jp(jvm, f"{path}/{t}_delta")
        if not fs.exists(ddir):
            continue
        remaining = 0
        for st in fs.listStatus(ddir):
            name = st.getPath().getName()
            m = re.fullmatch(r"_batch_id=(\d+)", name)
            if m and int(m.group(1)) <= del_floor:
                _fault_point(f"gc:delta:{t}:{name}")
                fs.delete(st.getPath(), True)
            elif m:
                remaining += 1
        if remaining == 0:
            _fault_point(f"gc:delta-dir:{t}")
            fs.delete(ddir, True)
