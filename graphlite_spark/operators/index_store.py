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
    single-writer contract was violated; nothing was corrupted)."""
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
        raise RuntimeError(
            f"concurrent index writer detected: manifest seq {seq} "
            f"already committed at {path} — this writer lost the race "
            f"and made no changes")
    if not fs.rename(tmp, final):
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
    try:
        delta = spark.read.parquet(ddir)
    except Exception:
        # an all-empty-epoch delta dir has no schema to infer
        return None
    floor, hwm = m.get("delta_floor"), m.get("hwm")
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
              manifest: "dict | None" = None) -> DataFrame:
    """base ∪ visible deltas, projected to the base's columns — the
    one read every against-index query and ingest epoch uses."""
    m = manifest if manifest is not None else current_manifest(spark, path)
    base = read_base(spark, path, tier, m)
    delta = read_delta(spark, path, tier, m, before_batch=before_batch)
    if delta is None:
        return base
    return base.unionByName(delta.select(*base.columns))


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
    diff = a.exceptAll(recomputed).count() + recomputed.exceptAll(a).count()
    if diff:
        raise ValueError(
            f"replay verification failed for epoch {batch_id} of "
            f"{path}/{tier}: {diff} rows differ between the committed "
            f"partition and the re-delivered batch's recomputation — "
            f"different data under a committed batch_id")


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
