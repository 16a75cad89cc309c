"""Collect the per-method time/memory protocol artifacts into one table.

Scans ``results*/<dataset>/<model>/<problem>/<method>/<split>/**`` for
``time_average.txt`` / ``max_memory_average.txt`` (written by
``scripts/tpu_compute_time.sh`` runs, mirroring the reference's
``scripts/script_compute_time.sh`` -> ``compute_average_time`` protocol,
reference utils.py:866-901) and prints a markdown table plus raw rows.

Usage: python scripts/collect_time_table.py [results_root ...]
"""

import os
import sys


def collect(roots):
    rows = []
    for root in roots:
        for dirpath, _, files in os.walk(root):
            if "time_average.txt" not in files:
                continue
            rel = os.path.relpath(dirpath, root).split(os.sep)
            # <dataset>/<model>/<problem>/<method>/<split>/k=v/...
            if len(rel) < 5:
                continue
            dataset, model, problem, method, split = rel[:5]

            def last_value(name):
                path = os.path.join(dirpath, name)
                if not os.path.exists(path):
                    return None
                with open(path) as f:
                    lines = [ln.strip() for ln in f if ln.strip()]
                if not lines:
                    return None
                try:
                    return float(lines[-1].split(":")[-1])
                except ValueError:
                    # a malformed trailing line in one artifact must not
                    # abort the whole collection — mark it missing
                    print(
                        "warning: unparseable last line in {}: {!r}".format(
                            path, lines[-1]
                        ),
                        file=sys.stderr,
                    )
                    return None

            rows.append(
                dict(
                    dataset=dataset, model=model, problem=problem,
                    method=method, split=split,
                    params="/".join(rel[5:]),
                    time_s=last_value("time_average.txt"),
                    mem_bytes=last_value("max_memory_average.txt"),
                )
            )
    return rows


def main():
    roots = sys.argv[1:] or ["results", "results_laplace"]
    rows = collect([r for r in roots if os.path.isdir(r)])
    if not rows:
        print("no time_average.txt artifacts found under", roots)
        return
    print("| method | model | time/batch (s) | peak mem (MB) | params |")
    print("|---|---|---|---|---|")
    for r in sorted(rows, key=lambda r: r["method"]):
        mem = (
            "{:.1f}".format(r["mem_bytes"] / 1e6)
            if r["mem_bytes"] is not None else "-"
        )
        t = "{:.4f}".format(r["time_s"]) if r["time_s"] is not None else "-"
        print(
            "| {method} | {model} | {t} | {mem} | {params} |".format(
                t=t, mem=mem, **r
            )
        )


if __name__ == "__main__":
    main()
