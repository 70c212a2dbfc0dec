"""Versioned on-disk iteration state — checkpoint/restart for the
iterative operators (PageRank, quantized k-means, BPE training).

The operational face of 100 TB iteration: a power-iteration or Lloyd
run that takes hours on a real cluster WILL sometimes lose its driver
(spot preemption, OOM, deploy), and restarting from scratch doubles the
bill. Each iterative operator therefore accepts a ``checkpoint_dir``:
when set, iteration state is persisted every ``checkpoint_every``
rounds and a rerun of the same call RESUMES from the newest complete
checkpoint instead of iteration 0. The operators are deterministic
(exact integer state, total-order tie-breaks — see their docstrings),
so a resumed run is BIT-IDENTICAL to an uninterrupted one; that
equality is the test invariant (tests/test_checkpoint.py) and the
oracle shape for the catalog query queued for the next audit window.

Storage layout — crash-consistent without rename atomicity (works on
object stores, where directory rename is neither atomic nor cheap):

    <root>/v000001/  part-*.parquet + _SUCCESS
    <root>/v000002/  ...

One subdirectory per checkpointed ITERATION (absolute, 1-based),
written by Spark's parquet committer, which creates ``_SUCCESS`` only
after every task commits. A writer that dies mid-checkpoint leaves a
directory WITHOUT the marker; :func:`latest_iteration` ignores it and
resume falls back to the previous complete version (the half-written
directory is overwritten when that iteration is next reached). This is
the Delta-log/Iceberg-snapshot idea reduced to what iteration state
needs — monotone versions + a commit marker, no manifest compaction.

Config guard — the r7 stamp-and-check pattern (`dedup.shingle_sets`):
:func:`save_state` stamps the producing operator's name and its
semantics-bearing parameters into the FIRST column's metadata (survives
the parquet round-trip via the Spark schema footer). :func:`load_state`
re-checks the stamp against what the resuming call expects and RAISES
on mismatch — resuming a damping=0.85 PageRank from damping=0.5 state,
or a k=8 k-means from k=16 centroids, would otherwise converge to a
silently wrong fixed point. A foreign parquet directory (no stamp) is
rejected the same way: state directories are operator-owned.

Cost: one linear parquet write of the state table per checkpointed
round — node-sized ranks for PageRank (the largest state here; edges,
which dominate the data, are NEVER checkpointed — they are input),
k×d centroid longs for k-means, n_merges rows for BPE. Resuming also
TRUNCATES LINEAGE for free: the resumed frame reads from files, so the
restart does not replay the pre-crash DAG (the iterative-lineage trap
handled in-process by localCheckpoint, handled across processes here).
"""

from __future__ import annotations

import json
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "save_state",
    "load_state",
    "latest_iteration",
    "complete_iterations",
    "vacuum",
]

_META_KEY = "ckpt"
_VDIR = re.compile(r"^v(\d{6})$")


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath, jvm


def _vpath(root: str, iteration: int) -> str:
    if iteration < 1:
        raise ValueError(f"iteration must be >= 1, got {iteration}")
    return f"{root.rstrip('/')}/v{iteration:06d}"


def save_state(
    state: DataFrame, root: str, iteration: int, meta: dict
) -> str:
    """Persist ``state`` as checkpoint ``iteration`` under ``root``.

    ``meta`` identifies the producing operator and its semantics-bearing
    parameters (JSON-serializable scalars); it is stamped into the first
    column's metadata and re-checked by :func:`load_state`. Writing the
    same iteration twice overwrites (re-running a crashed round is the
    normal recovery path). Returns the directory written."""
    path = _vpath(root, iteration)
    first, *rest = state.columns
    stamped = state.select(
        F.col(first).alias(
            first, metadata={_META_KEY: {"meta": json.dumps(meta, sort_keys=True)}}
        ),
        *rest,
    )
    stamped.write.mode("overwrite").parquet(path)
    return path


def complete_iterations(spark: SparkSession, root: str) -> list[int]:
    """All COMPLETE checkpoint iterations under ``root`` (``_SUCCESS``
    present), ascending; empty if none (including root not existing).
    The set need not be contiguous: checkpoint cadence skips rounds and
    :func:`vacuum` deletes superseded ones."""
    fs, jroot, jvm = _fs(spark, root)
    if not fs.exists(jroot):
        return []
    out = []
    for st in fs.listStatus(jroot):
        if not st.isDirectory():
            continue
        m = _VDIR.match(st.getPath().getName())
        if not m:
            continue
        marker = jvm.org.apache.hadoop.fs.Path(st.getPath(), "_SUCCESS")
        if not fs.exists(marker):
            continue  # crashed mid-write; incomplete, not resumable
        out.append(int(m.group(1)))
    return sorted(out)


def latest_iteration(
    spark: SparkSession, root: str, at_most: int | None = None
) -> int | None:
    """Newest COMPLETE checkpoint iteration under ``root``, or None if
    there is none. ``at_most`` bounds the answer — a rerun targeting
    FEWER total iterations than a previous run checkpointed must resume
    from a version at or below its own target, not from the future."""
    done = [
        n
        for n in complete_iterations(spark, root)
        if at_most is None or n <= at_most
    ]
    return done[-1] if done else None


def load_state(
    spark: SparkSession, root: str, iteration: int, meta: dict
) -> DataFrame:
    """Read checkpoint ``iteration`` and verify its stamp equals ``meta``
    (raises ValueError on mismatch or on unstamped/foreign data)."""
    df = spark.read.parquet(_vpath(root, iteration))
    stamp = (df.schema[df.columns[0]].metadata or {}).get(_META_KEY)
    want = json.dumps(meta, sort_keys=True)
    got = stamp.get("meta") if isinstance(stamp, dict) else None
    if got != want:
        raise ValueError(
            f"checkpoint at {_vpath(root, iteration)} was written by a "
            f"different operator/configuration: stamped {got!r}, the "
            f"resuming call expects {want!r}; point checkpoint_dir at "
            "this run's own state directory"
        )
    # strip the stamp (explicit empty metadata — a bare alias would
    # PRESERVE it) so resumed state is column-identical to in-flight
    # state; the stamp is storage provenance, not data
    first, *rest = df.columns
    return df.select(F.col(first).alias(first, metadata={}), *rest)


def vacuum(spark: SparkSession, root: str, keep_last: int = 1) -> list[str]:
    """Retention for the checkpoint store: delete superseded versions,
    return the paths removed (sorted).

    A long iterative run checkpointing every round accumulates one
    node-sized state table per round — at 100 TB graph sizes that is
    the dominant storage cost of restartability, and all but the
    newest few versions are dead weight (resume only ever reads the
    newest complete one; older versions exist solely as fallbacks for
    a torn newest). Policy, conservative by construction:

    * keep the newest ``keep_last`` COMPLETE checkpoints (>= 1 — the
      store must stay resumable, so a full wipe is not expressible
      here; delete ``root`` itself for that);
    * delete complete versions older than those;
    * delete incomplete (no ``_SUCCESS``) versions only when a NEWER
      complete one exists — such a directory is a crashed write that
      a later successful round already superseded. An incomplete dir
      newer than every complete one is left alone: it may be a writer
      in flight right now, and :func:`save_state` overwrites it
      harmlessly when that iteration is next reached.
    * foreign (non ``vNNNNNN``) entries are never touched.

    Concurrency caveat: a resumer targeting the SAME or more iterations
    reads the newest complete version, which vacuum never deletes. A
    rerun with a SMALLER ``iters`` resumes from an older version
    (``latest_iteration(at_most=...)``) that vacuum may be deleting —
    don't run retention concurrently with reduced-target reruns, or
    keep enough versions (``keep_last``) to cover them."""
    if keep_last < 1:
        raise ValueError(f"keep_last must be >= 1, got {keep_last}")
    fs, jroot, jvm = _fs(spark, root)
    if not fs.exists(jroot):
        return []
    complete: list[int] = []
    incomplete: list[int] = []
    for st in fs.listStatus(jroot):
        if not st.isDirectory():
            continue
        m = _VDIR.match(st.getPath().getName())
        if not m:
            continue
        n = int(m.group(1))
        marker = jvm.org.apache.hadoop.fs.Path(st.getPath(), "_SUCCESS")
        (complete if fs.exists(marker) else incomplete).append(n)
    if not complete:
        return []  # nothing supersedes anything — don't touch in-flight
    keep = set(sorted(complete)[-keep_last:])
    newest_complete = max(complete)
    doomed = [n for n in complete if n not in keep] + [
        n for n in incomplete if n < newest_complete
    ]
    removed = []
    for n in sorted(doomed):
        path = _vpath(root, n)
        fs.delete(jvm.org.apache.hadoop.fs.Path(path), True)
        removed.append(path)
    return removed
