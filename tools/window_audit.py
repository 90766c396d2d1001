"""Rotation-rule audit: changed code must re-prove inside the driver window.

The driver's correctness gate checks the FIRST 50 entries of
``__spark_entry__.queries()`` each round. The repo's rotation rule says any
query whose code (query function, oracle, or any engine module on its call
path) changed since the last round boundary must sit inside that window.
Round 4 was dinged for missing this on ``ann_lsh_multitable``; round 5
nearly repeated it on ``minhash_lsh`` after a dedup.py refactor. This tool
automates the check.

Static approximation of "call path": for each ``q_*`` function body we
collect (a) modules named in ``from etl_documentos_spark.X import`` /
``import etl_documentos_spark.X`` statements inside the function, and (b)
attribute uses of the module aliases imported at queries.py top level
(``dedup.``, ``lww.``, ``similarity.``, ``analytics.``, ``tx.``). That
over-approximates per-FUNCTION granularity (a module counts as touched even
if the edited function isn't the one called) — misses in the conservative
direction, so a clean audit is trustworthy and a flag may be a documented
function-level exception (e.g. an append-only codec module). Exceptions are
listed explicitly below with their justification; keep them in sync with
the rotation comments in plans/queries.py.

Usage: python tools/window_audit.py [base_ref]   (default: last round tag)
Exit 1 if an undocumented changed-module query sits outside the window.
"""

from __future__ import annotations

import ast
import os
import re
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
QUERIES_PY = os.path.join(REPO, "etl_documentos_spark", "plans", "queries.py")

#: top-level aliases in queries.py -> module path
TOP_ALIASES = {
    "dedup": "etl_documentos_spark/operators/dedup.py",
    "lww": "etl_documentos_spark/operators/lww.py",
    "similarity": "etl_documentos_spark/operators/similarity.py",
    "analytics": "etl_documentos_spark/analytics.py",
    "tx": "etl_documentos_spark/functions/text.py",
}

#: (query, module) pairs exempt from the window despite a module-level
#: change, with the function-level justification. Audited each round.
EXCEPTIONS: dict[tuple[str, str], str] = {
    # r5 multimodal.py diff is a pure append (WebP codec): decoders for
    # other formats are byte-identical; module re-proven in-window by
    # multimodal_meta/decode_dispatch/webp_decode
    **{
        (q, "etl_documentos_spark/sources/multimodal.py"):
            "r5 append-only diff (WebP); function untouched"
        for q in (
            "bmp_decode", "png_decode", "wav_decode", "jpeg_decode",
            "tiff_decode", "gif_decode", "gif_frame_sample",
            "multimodal_decode", "frame_sample", "multimodal_meta",
        )
    },
    # r5 dedup.py diff touches ONLY the minhash banding path
    # (minhash_lsh_pairs refactored into banded_signatures + wrapper —
    # verified: `git diff d4cf064..HEAD -- operators/dedup.py` shows no
    # other function edited); minhash_lsh itself re-proves in-window,
    # these rows exercise the byte-identical jaccard/simhash/winnow/
    # exact-fingerprint functions
    **{
        (q, "etl_documentos_spark/operators/dedup.py"):
            "r5 diff confined to minhash banding; function untouched"
        for q in (
            "doc_fingerprints", "near_dup_jaccard", "near_dup_shingles",
            "simhash", "winnow_fingerprints",
        )
    },
}


def _module_of(name: str) -> str | None:
    if not name.startswith("etl_documentos_spark"):
        return None
    return name.replace(".", "/") + ".py"


def query_deps() -> dict[str, set[str]]:
    """query name -> set of engine module paths its function touches."""
    src = open(QUERIES_PY).read()
    tree = ast.parse(src)
    fn_deps: dict[str, set[str]] = {}
    for node in ast.walk(tree):
        if not isinstance(node, ast.FunctionDef) or not node.name.startswith(
            "q_"
        ):
            continue
        deps: set[str] = {"etl_documentos_spark/plans/queries.py"}
        body_src = ast.get_source_segment(src, node) or ""
        for sub in ast.walk(node):
            if isinstance(sub, ast.ImportFrom) and sub.module:
                m = _module_of(sub.module)
                if m:
                    deps.add(m)
            elif isinstance(sub, ast.Import):
                for a in sub.names:
                    m = _module_of(a.name)
                    if m:
                        deps.add(m)
        for alias, mod in TOP_ALIASES.items():
            if re.search(rf"\b{alias}\.", body_src):
                deps.add(mod)
        fn_deps[node.name] = deps

    import __spark_entry__ as entry

    names = list(entry.queries())
    out = {}
    qsrc = open(QUERIES_PY).read()
    reg = re.search(r"QUERIES: dict\[str, Query\] = \{(.*?)\n\}", qsrc, re.S)
    fn_by_name = dict(
        re.findall(r'"([a-z0-9_]+)":\s*(q_[a-z0-9_]+)', reg.group(1))
    )
    for n in names:
        out[n] = fn_deps.get(fn_by_name.get(n, ""), set())
    return out


def main() -> int:
    base = sys.argv[1] if len(sys.argv) > 1 else None
    if base is None:
        # last round boundary = most recent commit touching VERDICT.md
        base = subprocess.check_output(
            ["git", "log", "-1", "--format=%H", "--", "VERDICT.md"],
            cwd=REPO, text=True,
        ).strip()
    changed = set(
        subprocess.check_output(
            ["git", "diff", "--name-only", f"{base}..HEAD"],
            cwd=REPO, text=True,
        ).splitlines()
    )
    # registry-only edits to queries.py are handled per-function below;
    # a query function's own change shows as queries.py for every query,
    # so restrict queries.py attribution to functions whose source
    # actually differs
    qsrc_now = open(QUERIES_PY).read()
    try:
        qsrc_base = subprocess.check_output(
            ["git", "show", f"{base}:etl_documentos_spark/plans/queries.py"],
            cwd=REPO, text=True,
        )
    except subprocess.CalledProcessError:
        qsrc_base = ""

    def fn_bodies(src: str) -> dict[str, str]:
        try:
            tree = ast.parse(src)
        except SyntaxError:
            return {}
        return {
            n.name: ast.get_source_segment(src, n) or ""
            for n in ast.walk(tree)
            if isinstance(n, ast.FunctionDef) and n.name.startswith("q_")
        }

    now_b, base_b = fn_bodies(qsrc_now), fn_bodies(qsrc_base)
    changed_fns = {
        name for name, body in now_b.items() if base_b.get(name) != body
    }

    deps = query_deps()
    names = list(deps)
    window = set(names[:50])
    reg = re.search(
        r"QUERIES: dict\[str, Query\] = \{(.*?)\n\}", qsrc_now, re.S
    )
    fn_by_name = dict(
        re.findall(r'"([a-z0-9_]+)":\s*(q_[a-z0-9_]+)', reg.group(1))
    )

    flags = []
    for name, mods in deps.items():
        if name in window:
            continue
        hits = []
        for m in mods - {"etl_documentos_spark/plans/queries.py"}:
            if m in changed and (name, m) not in EXCEPTIONS:
                hits.append(m)
        if fn_by_name.get(name) in changed_fns:
            hits.append("its own query function")
        if hits:
            flags.append((name, hits))

    print(f"base {base[:12]} | {len(changed)} files changed | "
          f"{len(names)} queries, window=50")
    if flags:
        for name, hits in flags:
            print(f"FLAG {name}: changed {', '.join(sorted(hits))} "
                  "but outside the driver window")
        return 1
    n_exc = sum(
        1 for (q, m) in EXCEPTIONS if m in changed and q not in window
    )
    print(f"OK: every changed-code query is in-window "
          f"({n_exc} documented function-level exceptions applied)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
