"""Shared atomic-publish core (VERDICT r04 #7).

Four persisted artifacts grew their own crash-safe publish protocol,
one round apart: ServingTable's version-pointer swap
(``streaming/serving.py``), the dedup fingerprint index's per-unit
markers (``operators/incremental_dedup.py``), the ANN index's build
marker (``operators/ann_index.py``), and the rollup tables' JSON
manifest (``sources/rollup.py``). All four reduce to the same two
primitives, extracted here so there is ONE implementation and ONE test
suite instead of four hand-rolled renames waiting to diverge:

- :func:`atomic_write_text` — write to a dot-prefixed temp file in the
  SAME directory, then ``os.replace`` onto the final name. POSIX
  rename is atomic within a filesystem; readers observe either the old
  content or the new, never a torn write. Every pointer swap, manifest
  commit, marker publish, and wire ``_SUCCESS`` in the package routes
  through this function.
- the UNIT-MARKER protocol (:func:`commit_unit` /
  :func:`committed_units` / :func:`marker_state` /
  :func:`next_unit_label`) — insert-only tables grow by unit-scoped
  directories (``<table>/unit=<label>/``) that become visible only
  when ``_commits/<label>`` renames into place AFTER every table of
  the artifact has written its unit rows. A crash mid-unit leaves
  directories no reader resolves; a replay overwrites them (unit
  writes use ``mode("overwrite")`` on the unit directory, so replay is
  idempotent) and commits the marker. Compaction publishes a
  consolidated unit whose marker carries ``supersedes=u1,u2,...`` —
  the SAME rename simultaneously publishes the new unit and retires
  the old ones (readers subtract every marker's supersedes set, even
  from markers later superseded themselves, because a crashed vacuum
  can leave stale markers behind).

Single-writer by design: auto-generated labels assume one writer per
artifact (streaming paths derive labels from batch ids; concurrent
manual writers would need the ServingTable version-claim protocol,
which stays bespoke in ``serving.py`` because it also carries bucket
counts through the same swap).

Reference parity note: the reference (412 LoC Express pipeline,
in-memory Maps — ``src/services/ingestionService.js``) persists
nothing and needs no commit protocol; this module is BASELINE.json
north-star infrastructure (crash-safe incremental artifacts at 100 TB).
"""

from __future__ import annotations

import os

#: conventional single-marker name for build-once artifacts
BUILD_MARKER = "_COMMITTED"
#: directory holding one marker file per committed unit
COMMITS_DIR = "_commits"


def atomic_write_text(final_path: str, content: str) -> None:
    """Publish ``content`` at ``final_path`` atomically: dot-prefixed
    temp file in the same directory (same filesystem — ``os.replace``
    across filesystems would degrade to copy+delete), fsync-free by
    design (the artifacts are rebuildable caches; durability-after-
    power-loss is the lakehouse object store's job, not the local
    test harness's), then one rename. The rename is the commit point."""
    d, name = os.path.split(final_path)
    if d:
        os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f".{name}.tmp")
    with open(tmp, "w") as f:
        f.write(content)
    os.replace(tmp, final_path)


def write_marker(root: str, name: str = BUILD_MARKER, content: str = "ok") -> None:
    """Publish a build-once marker under ``root`` (atomic)."""
    atomic_write_text(os.path.join(root, name), content)


def require_marker(root: str, what: str, builder: str, name: str = BUILD_MARKER) -> None:
    """Readers of a build-once artifact refuse a directory without its
    marker — a crashed half-written build is an ERROR, not silently
    wrong results."""
    if not os.path.exists(os.path.join(root, name)):
        raise FileNotFoundError(
            f"{what} at {root} has no {name} marker "
            f"(never built, or a build crashed mid-write); run {builder}"
        )


def marker_state(root: str) -> tuple[set[str], set[str]]:
    """(all committed marker names, union of every marker's supersedes
    set). A plain unit's marker contains its own label; a compaction
    unit's marker contains ``supersedes=u1,u2,...`` — the units whose
    content it consolidated. Supersession applies from ALL markers
    (even ones that were themselves later superseded): a crashed
    cleanup can leave an old marker behind, and its supersedes set must
    keep shadowing units whose content now lives two compactions deep."""
    d = os.path.join(root, COMMITS_DIR)
    if not os.path.isdir(d):
        return set(), set()
    names = {f for f in os.listdir(d) if not f.startswith((".", "_"))}
    superseded: set[str] = set()
    for n in names:
        with open(os.path.join(d, n)) as f:
            content = f.read().strip()
        if content.startswith("supersedes="):
            superseded.update(
                u for u in content[len("supersedes=") :].split(",") if u
            )
    return names, superseded


def committed_units(root: str) -> list[str]:
    """Unit labels whose marker committed and that no compaction marker
    supersedes — the ONLY units any reader resolves. Sorted for
    deterministic read order."""
    names, superseded = marker_state(root)
    return sorted(names - superseded)


def commit_unit(root: str, unit: str, supersedes: list[str] | None = None) -> None:
    """Atomically publish a unit marker. Before the rename nothing
    references the unit's directories; after it, every table of the
    artifact observes the unit together. A compaction passes
    ``supersedes`` — the consolidated-away labels — making the same
    rename publish the new unit and retire the old ones."""
    content = (
        "supersedes=" + ",".join(supersedes) if supersedes is not None else unit
    )
    atomic_write_text(os.path.join(root, COMMITS_DIR, unit), content)


def next_unit_label(root: str, prefix: str = "u") -> str:
    """Next free ``<prefix><NNNNNN>`` label (``u`` for ingest units,
    ``c`` for compaction units by house convention). Skips names any
    marker has ever used OR superseded: reusing a superseded label
    would commit a unit that compaction markers already shadow
    (silently invisible history). Single-writer assumption documented
    above."""
    names, superseded = marker_state(root)
    taken = names | superseded
    i = 0
    while f"{prefix}{i:06d}" in taken:
        i += 1
    return f"{prefix}{i:06d}"
