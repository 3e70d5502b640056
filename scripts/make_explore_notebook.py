"""Generates scripts/explore.ipynb from scripts/explore.py.

Parity: the reference ships the exploration walkthrough twice, as
scripts/explore.py and scripts/explore.ipynb. The rebuild keeps the
``# %%`` cell script as the source of truth and derives the notebook from
it, so the two can never drift: this tool inlines the script's imports and
`main` body (dedented, argparse dropped, `src`/`cfg` exposed as a
parameter cell) and splits cells on the ``# %%`` markers.

Usage: python scripts/make_explore_notebook.py  [--check]
(--check verifies the committed notebook is up to date, exit 1 otherwise.)
"""

import argparse
import json
import os.path as osp
import re
import sys

HERE = osp.dirname(osp.abspath(__file__))


def build_cells() -> list:
    src = open(osp.join(HERE, "explore.py")).read()

    # Module docstring -> markdown intro cell.
    doc = re.match(r'"""(.*?)"""', src, re.S).group(1).strip()

    # Imports between the docstring and `def main` (drop argparse, keep
    # the sys.path bootstrap pointing one level further up: the notebook
    # lives in scripts/ like the script does).
    body = src[re.match(r'"""(.*?)"""\s*', src, re.S).end():]
    imports = body[:body.index("def main(")]
    imports = "\n".join(
        ln for ln in imports.splitlines()
        if ln.strip() and not ln.startswith("import argparse"))
    imports = imports.replace('osp.dirname(__file__)', '".."').replace(
        'osp.join("..", "..")', 'osp.join("..")')

    # main body, dedented one level, trailing plt.show kept.
    main_src = body[body.index("def main("):]
    main_lines = main_src.splitlines()
    inner = []
    for ln in main_lines[1:]:
        if ln.startswith('if __name__'):
            break
        inner.append(ln[4:] if ln.startswith("    ") else ln)
    main_body = "\n".join(inner).strip("\n")

    params = ('# Point this at a raw K-Radar tree (see README / fixture).\n'
              'src = "/path/to/kradar/raw"\n'
              'cfg = "../config/kradar.json"')

    code = imports + "\n\n" + params + "\n\n" + main_body
    cells = [{"cell_type": "markdown", "metadata": {},
              "source": doc.splitlines(keepends=True)}]
    for chunk in re.split(r"\n# %% ?", code):
        chunk = chunk.strip("\n")
        if not chunk:
            continue
        first, _, rest = chunk.partition("\n")
        if not first.startswith(("import", "from", "#", '"')) \
                and "=" not in first and "(" not in first:
            # Cell-title line from a `# %%` marker -> markdown heading.
            cells.append({"cell_type": "markdown", "metadata": {},
                          "source": [f"## {first}"]})
            chunk = rest.strip("\n")
        cells.append({"cell_type": "code", "metadata": {},
                      "execution_count": None, "outputs": [],
                      "source": chunk.splitlines(keepends=True)})
    return cells


def notebook() -> dict:
    return {
        "cells": build_cells(),
        "metadata": {
            "kernelspec": {"display_name": "Python 3",
                           "language": "python", "name": "python3"},
            "language_info": {"name": "python", "version": "3"},
        },
        "nbformat": 4,
        "nbformat_minor": 5,
    }


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--check", action="store_true")
    args = p.parse_args()
    out = osp.join(HERE, "explore.ipynb")
    text = json.dumps(notebook(), indent=1) + "\n"
    if args.check:
        ok = osp.exists(out) and open(out).read() == text
        print("explore.ipynb up to date" if ok else "explore.ipynb STALE")
        sys.exit(0 if ok else 1)
    with open(out, "w") as f:
        f.write(text)
    print(f"wrote {out}")
