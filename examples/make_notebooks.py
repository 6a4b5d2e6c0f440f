"""Generate executed .ipynb versions of the tutorial example scripts.

The reference ships its tutorials as notebooks
(`/root/reference/examples/basic_tutorial.ipynb`,
`speech_decomposition.ipynb`); this repo keeps the runnable `.py` scripts
as the source of truth and derives notebooks from them so notebook users
migrating from the reference find the same artifact shape.

Conversion rules (scripts follow a shared layout):

* module docstring            -> leading markdown cell
* top-level imports and defs  -> one setup code cell
* ``main()`` body             -> code cells split on ``# --- section ---``
  comments, each preceded by a markdown cell with the section title

Each cell is executed in a shared namespace with stdout captured, so the
generated notebooks carry real outputs.  Runs on the CPU platform.

Run:  python examples/make_notebooks.py
"""

import ast
import contextlib
import io
import json
import os
import re
import sys
import textwrap

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def split_script(path):
    src = open(path).read()
    tree = ast.parse(src)
    lines = src.split("\n")

    doc = ast.get_docstring(tree) or ""
    doc = re.sub(r"\n*Run:.*$", "", doc, flags=re.S).strip()

    main_fn = next(
        n for n in tree.body
        if isinstance(n, ast.FunctionDef) and n.name == "main"
    )
    body_start = main_fn.body[0].lineno - 1
    body_end = main_fn.end_lineno

    # setup: everything between the docstring and def main(), minus the
    # repo-root path shim (notebooks run from examples/ with the package
    # installed or one level up)
    first = tree.body[0]
    setup_start = first.end_lineno if isinstance(first, ast.Expr) else 0
    setup = "\n".join(lines[setup_start:main_fn.lineno - 1])
    setup = setup.replace(
        'sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))',
        'sys.path.insert(0, "..")',
    ).replace("os.path.dirname(__file__)", '"."')
    setup = textwrap.dedent(setup).strip()

    body = textwrap.dedent("\n".join(lines[body_start:body_end]))
    # split on section markers
    cells = [("code", setup)]
    current = []
    for line in body.split("\n"):
        m = re.match(r"\s*# --- (.*?) -*$", line)
        if m:
            if "\n".join(current).strip():
                cells.append(("code", "\n".join(current).strip()))
            current = []
            cells.append(("markdown", "### " + m.group(1).strip()))
        else:
            current.append(line)
    if "\n".join(current).strip():
        cells.append(("code", "\n".join(current).strip()))
    return doc, cells


def execute_cells(cells, cwd):
    ns = {"__name__": "__main__"}
    out_cells = []
    old = os.getcwd()
    os.chdir(cwd)
    try:
        for kind, src in cells:
            if kind == "markdown":
                out_cells.append((kind, src, None))
                continue
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                exec(compile(src, "<cell>", "exec"), ns)
            out_cells.append((kind, src, buf.getvalue()))
    finally:
        os.chdir(old)
    return out_cells


def to_notebook(title_md, cells):
    nb_cells = [{
        "cell_type": "markdown",
        "metadata": {},
        "source": title_md.splitlines(keepends=True),
    }]
    for kind, src, out in cells:
        if kind == "markdown":
            nb_cells.append({
                "cell_type": "markdown",
                "metadata": {},
                "source": src.splitlines(keepends=True),
            })
        else:
            outputs = []
            if out:
                outputs.append({
                    "output_type": "stream",
                    "name": "stdout",
                    "text": out.splitlines(keepends=True),
                })
            nb_cells.append({
                "cell_type": "code",
                "execution_count": None,
                "metadata": {},
                "source": src.splitlines(keepends=True),
                "outputs": outputs,
            })
    return {
        "cells": nb_cells,
        "metadata": {
            "kernelspec": {
                "display_name": "Python 3",
                "language": "python",
                "name": "python3",
            },
            "language_info": {"name": "python", "version": "3"},
        },
        "nbformat": 4,
        "nbformat_minor": 5,
    }


def main():
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass

    here = os.path.dirname(os.path.abspath(__file__))
    for script in ("basic_tutorial.py", "source_filter_model.py"):
        path = os.path.join(here, script)
        doc, cells = split_script(path)
        executed = execute_cells(cells, here)
        nb = to_notebook("# " + doc, executed)
        out_path = path[:-3] + ".ipynb"
        with open(out_path, "w") as f:
            json.dump(nb, f, indent=1)
        print("wrote", out_path)


if __name__ == "__main__":
    main()
