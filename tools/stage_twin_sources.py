#!/usr/bin/env python
"""One-shot refactor: convert per-run stream-twin SOURCE writes to
staged_stream_src (r16 VERDICT item 6 pattern, applied to the remaining
individually-shaped build blocks).

Matches, inside each `def q_stream_*` body, the exact idiom:

    root = os.path.join(os.path.dirname(_CHECKPOINT_ROOT), "<name>")
    src = os.path.join(root, "src")
    ...
    for d in (src, a, b):
        shutil.rmtree(d, ignore_errors=True)
    ...
    for i in range(N):
        <single-line write>.parquet(src)

and rewrites to:

    for d in (a, b):
        shutil.rmtree(d, ignore_errors=True)
    ...
    def _build_src(d: str) -> None:
        for i in range(N):
            <single-line write>.parquet(d)

    from noaa_etl_spark.streaming.core import staged_stream_src
    src = staged_stream_src(sf_dir, "<name>", _build_src)

Any q_stream_* function that writes to `src` but does NOT match the
idiom exactly is reported for manual conversion. Dry run by default;
pass --apply to write the file.
"""

import re
import sys

PATH = "/root/repo/noaa_etl_spark/queries/streaming.py"

with open(PATH) as f:
    text = f.read()

lines = text.split("\n")

# Locate function spans.
all_defs = [i for i, ln in enumerate(lines) if re.match(r"def \w+\(", ln)]
func_starts = [
    (i, re.match(r"def (q_stream_\w+)\(", ln).group(1))
    for i, ln in enumerate(lines)
    if re.match(r"def q_stream_\w+\(", ln)
]
spans = []
for start, name in func_starts:
    later = [d for d in all_defs if d > start]
    end = later[0] if later else len(lines)
    spans.append((name, start, end))

converted, skipped, manual = [], [], []
out_lines = list(lines)
offset = 0  # line-index shift from edits applied so far

for name, start, end in spans:
    body = lines[start:end]
    body_text = "\n".join(body)
    if "staged_stream_src(" in body_text:
        skipped.append((name, "already staged"))
        continue
    if ".parquet(src)" not in body_text:
        skipped.append((name, "no src writes"))
        continue

    # 1. root name
    m_root = re.search(
        r'root = os\.path\.join\(os\.path\.dirname\(_CHECKPOINT_ROOT\), "([\w]+)"\)',
        body_text,
    )
    # 2. src assignment line: the simple form is deleted; the
    #    tuple-unpack form is kept (staged call reassigns src below it)
    src_line = None
    unpack_form = False
    for j, ln in enumerate(body):
        if re.match(r'    src = os\.path\.join\(root, "src"\)$', ln):
            src_line = j
            break
        if re.match(r"    src, [\w, ]+ = \(os\.path\.join\(root, d\) for d in", ln):
            src_line = j
            unpack_form = True
            break
    # 3. rmtree tuple containing src
    rm_line = None
    rm_names = None
    for j, ln in enumerate(body):
        m = re.match(r"    for d in \(([^)]*)\):$", ln)
        if m and "src" in [x.strip() for x in m.group(1).split(",") if x.strip()]:
            if body[j + 1].strip() == "shutil.rmtree(d, ignore_errors=True)":
                rm_line = j
                rm_names = [x.strip() for x in m.group(1).split(",") if x.strip()]
                break
    # 4. the write loop: `    for i in range(N):` whose next line is a
    #    single-line statement ending in `.parquet(src)`
    wl_line = None
    for j, ln in enumerate(body):
        m = re.match(r"    for i in range\((\d+)\):$", ln)
        if m and j + 1 < len(body) and body[j + 1].rstrip().endswith(".parquet(src)") and body[j + 1].startswith("        ") and not body[j + 1].startswith("         "):
            # ensure loop body is exactly one line (next-next line dedents)
            if j + 2 >= len(body) or not body[j + 2].startswith("        "):
                wl_line = j
                break

    if not (m_root and src_line is not None and rm_line is not None and wl_line is not None):
        manual.append(
            (name, f"root={bool(m_root)} src={src_line} rm={rm_line} loop={wl_line}")
        )
        continue

    twin_name = m_root.group(1)
    new_body = list(body)

    # Edit write loop (do later edits first to keep indices valid):
    write_stmt = body[wl_line + 1].replace(".parquet(src)", ".parquet(d)")
    new_body[wl_line : wl_line + 2] = [
        "    def _build_src(d: str) -> None:",
        "    " + body[wl_line],
        "    " + write_stmt,
        "",
        "    # r16 opt (VERDICT r15 item 6): micro-batch source files staged",
        "    # once per session — the drain (checkpoint fresh per run) is",
        "    # unchanged.",
        "    from noaa_etl_spark.streaming.core import staged_stream_src",
        "",
        f'    src = staged_stream_src(sf_dir, "{twin_name}", _build_src)',
    ]
    # Edit rmtree tuple
    kept = [x for x in rm_names if x != "src"]
    tup = ", ".join(kept) + ("," if len(kept) == 1 else "")
    new_body[rm_line] = f"    for d in ({tup}):"
    # Remove src assignment (simple form only; unpack form is kept and
    # src is simply reassigned by the staged call)
    if not unpack_form:
        del new_body[src_line]

    # Apply to out_lines
    real_start = start + offset
    real_end = end + offset
    out_lines[real_start:real_end] = new_body
    offset += len(new_body) - (end - start)
    converted.append((name, twin_name))

print(f"converted: {len(converted)}")
for n, t in converted:
    print(f"  {n} -> {t}")
print(f"skipped: {len(skipped)}")
for n, r in skipped:
    print(f"  {n}: {r}")
print(f"MANUAL: {len(manual)}")
for n, r in manual:
    print(f"  {n}: {r}")

if "--apply" in sys.argv:
    with open(PATH, "w") as f:
        f.write("\n".join(out_lines))
    print("APPLIED")
