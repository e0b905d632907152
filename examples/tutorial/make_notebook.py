"""Generate GOKU-net_pendulum_tutorial.ipynb from tutorial.py, executed.

The reference ships its tutorial as a 46-cell notebook
(examples/tutorial/GOKU-net_pendulum_tutorial.ipynb). This script turns the
maintained tutorial.py (single source of truth) into a notebook: section
banners become markdown cells, code runs in-process with stdout captured as
cell outputs.

Run: LDQ_PLATFORM=cpu python examples/tutorial/make_notebook.py
"""
import base64
import io
import os
import re
import sys
from contextlib import redirect_stdout

import nbformat as nbf

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "tutorial.py")
OUT = os.path.join(HERE, "GOKU-net_pendulum_tutorial.ipynb")
BANNER = re.compile(r"^# -{5,}\s*$")


def split_sections(text: str):
    """Yield (markdown, code) chunks: banner-comment blocks become
    markdown; everything between them is code."""
    lines = text.splitlines()
    # module docstring -> intro markdown
    mod = re.match(r'"""(.*?)"""\s*', text, re.S)
    intro = mod.group(1).strip() if mod else ""
    body = text[mod.end():] if mod else text
    lines = body.splitlines()

    chunks = [("md", "# GOKU-net pendulum tutorial\n\n" + intro)]
    code, i = [], 0
    while i < len(lines):
        if BANNER.match(lines[i]):
            if any(s.strip() for s in code):
                chunks.append(("code", "\n".join(code).strip("\n")))
            code = []
            i += 1
            md = []
            while i < len(lines) and lines[i].startswith("#") \
                    and not BANNER.match(lines[i]):
                md.append(lines[i].lstrip("# "))
                i += 1
            if i < len(lines) and BANNER.match(lines[i]):
                i += 1
            chunks.append(("md", "## " + "\n".join(md).strip()))
        else:
            code.append(lines[i])
            i += 1
    if any(s.strip() for s in code):
        chunks.append(("code", "\n".join(code).strip("\n")))
    return chunks


def main():
    chunks = split_sections(open(SRC).read())
    ns = {"__file__": SRC, "__name__": "__tutorial__"}
    nb = nbf.v4.new_notebook()
    nb.metadata["kernelspec"] = {"name": "python3",
                                 "display_name": "Python 3",
                                 "language": "python"}
    n_exec = 0
    for kind, src in chunks:
        if kind == "md":
            nb.cells.append(nbf.v4.new_markdown_cell(src))
            continue
        cell = nbf.v4.new_code_cell(src)
        buf = io.StringIO()
        with redirect_stdout(buf):
            exec(compile(src, SRC, "exec"), ns)  # noqa: S102 (own source)
        n_exec += 1
        cell.execution_count = n_exec
        out = buf.getvalue()
        if out:
            cell.outputs.append(nbf.v4.new_output("stream", name="stdout",
                                                  text=out))
        # matplotlib figures opened by this cell become inline png outputs
        try:
            import matplotlib.pyplot as plt
            for num in plt.get_fignums():
                fig = plt.figure(num)
                png = io.BytesIO()
                fig.savefig(png, format="png", dpi=80,
                            bbox_inches="tight")
                cell.outputs.append(nbf.v4.new_output(
                    "display_data",
                    data={"image/png":
                          base64.b64encode(png.getvalue()).decode()}))
            plt.close("all")
        except ImportError:
            pass
        nb.cells.append(cell)
    nbf.write(nb, OUT)
    print(f"wrote {OUT}: {len(nb.cells)} cells, {n_exec} executed")


if __name__ == "__main__":
    main()
