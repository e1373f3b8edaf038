"""Generate the rendered API reference site into docs/site/.

The reference ships a Documenter.jl site built from docstrings
(/root/reference/docs/make.jl, docs/src/index.md); this is the analog for
the TPU rebuild. No third-party doc generator is available in the image,
so this walks the package with `inspect` and emits a small static HTML
site: one page per module (module docstring, classes with methods,
functions with signatures), plus HTML renderings of the prose docs and
tutorials in docs/.

Usage: python scripts/gen_docs.py   # writes docs/site/
"""

import html
import importlib
import inspect
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")  # never touch the TPU relay

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "docs", "site")

MODULES = [
    "autogp_tpu",
    "autogp_tpu.api",
    "autogp_tpu.kernels",
    "autogp_tpu.model",
    "autogp_tpu.gp_math",
    "autogp_tpu.config",
    "autogp_tpu.distributions",
    "autogp_tpu.transforms",
    "autogp_tpu.schedule",
    "autogp_tpu.rescale",
    "autogp_tpu.tree",
    "autogp_tpu.callbacks",
    "autogp_tpu.backend",
    "autogp_tpu.inference.smc",
    "autogp_tpu.inference.smc_depth",
    "autogp_tpu.inference.moves",
    "autogp_tpu.inference.moves_da",
    "autogp_tpu.inference.hmc",
    "autogp_tpu.inference.greedy",
    "autogp_tpu.inference.check",
    "autogp_tpu.ops.cov_pallas",
    "autogp_tpu.ops.cov_pallas_vjp",
    "autogp_tpu.ops.chol_pallas",
    "autogp_tpu.parallel.mesh",
    "autogp_tpu.utils.timeit",
]

PROSE = ["overview.md", "api.md", "callbacks.md", "greedy_mcmc.md",
         "iclaims.md"]

STYLE = """
body { font-family: -apple-system, 'Segoe UI', Roboto, sans-serif;
       max-width: 60rem; margin: 2rem auto; padding: 0 1rem;
       color: #1a1a1a; line-height: 1.5; }
h1, h2, h3 { line-height: 1.2; }
h2 { border-bottom: 1px solid #ddd; padding-bottom: .2rem; }
code, pre { font-family: ui-monospace, 'SF Mono', Menlo, monospace;
            background: #f6f8fa; border-radius: 4px; }
code { padding: .1em .3em; }
pre { padding: .8rem; overflow-x: auto; }
pre code { padding: 0; background: none; }
.sig { background: #f0f4ff; padding: .5rem .8rem; border-radius: 4px;
       display: block; margin: .8rem 0 .3rem; }
.doc { white-space: pre-wrap; font-size: .95rem; margin: 0 0 1rem 1rem;
       color: #333; }
.member { margin-left: 1.5rem; }
nav a { margin-right: 1rem; }
table { border-collapse: collapse; }
td, th { border: 1px solid #ddd; padding: .3rem .6rem; }
"""


def _page(title, body, depth=0):
    root = "../" * depth
    return f"""<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>{html.escape(title)}</title>
<style>{STYLE}</style></head><body>
<nav><a href="{root}index.html">autogp_tpu API reference</a></nav>
{body}
</body></html>"""


def _doc_html(obj):
    d = inspect.getdoc(obj)
    if not d:
        return ""
    return f'<div class="doc">{html.escape(d)}</div>'


def _sig(name, obj):
    try:
        s = str(inspect.signature(obj))
    except (ValueError, TypeError):
        s = "(...)"
    return f'<code class="sig"><b>{html.escape(name)}</b>{html.escape(s)}</code>'


def _render_module(modname):
    mod = importlib.import_module(modname)
    parts = [f"<h1><code>{html.escape(modname)}</code></h1>",
             _doc_html(mod)]
    classes, functions = [], []
    for name, obj in sorted(vars(mod).items()):
        if name.startswith("_"):
            continue
        if getattr(obj, "__module__", None) != modname:
            continue  # only objects defined here (no re-exports)
        if inspect.isclass(obj):
            classes.append((name, obj))
        elif inspect.isfunction(obj):
            functions.append((name, obj))

    if classes:
        parts.append("<h2>Classes</h2>")
        for name, cls in classes:
            parts.append(_sig(name, cls))
            parts.append(_doc_html(cls))
            members = []
            for mname, mobj in sorted(vars(cls).items()):
                if mname.startswith("_") or not inspect.isfunction(mobj):
                    continue
                members.append(
                    f'<div class="member">{_sig(f"{name}.{mname}", mobj)}'
                    f"{_doc_html(mobj)}</div>")
            parts.extend(members)
    if functions:
        parts.append("<h2>Functions</h2>")
        for name, fn in functions:
            parts.append(_sig(name, fn))
            parts.append(_doc_html(fn))
    summary = (inspect.getdoc(mod) or "").split("\n")[0]
    return "\n".join(parts), summary


def _md_to_html(text):
    """Tiny markdown renderer for the prose docs (headings, fenced code,
    inline code, bold, links, lists, tables, paragraphs)."""
    out = []
    lines = text.split("\n")
    in_code = False
    in_list = False
    in_table = False

    def inline(s):
        s = html.escape(s)
        s = re.sub(r"`([^`]+)`", r"<code>\1</code>", s)
        s = re.sub(r"\*\*([^*]+)\*\*", r"<b>\1</b>", s)
        s = re.sub(r"\[([^\]]+)\]\(([^)]+)\)", r'<a href="\2">\1</a>', s)
        return s

    for ln in lines:
        if ln.startswith("```"):
            out.append("</pre>" if in_code else "<pre>")
            in_code = not in_code
            continue
        if in_code:
            out.append(html.escape(ln))
            continue
        if in_list and not ln.startswith(("- ", "  ")):
            out.append("</ul>")
            in_list = False
        if in_table and not ln.startswith("|"):
            out.append("</table>")
            in_table = False
        m = re.match(r"^(#{1,4}) (.*)$", ln)
        if m:
            n = len(m.group(1))
            out.append(f"<h{n}>{inline(m.group(2))}</h{n}>")
        elif ln.startswith("- "):
            if not in_list:
                out.append("<ul>")
                in_list = True
            out.append(f"<li>{inline(ln[2:])}</li>")
        elif ln.startswith("|"):
            cells = [c.strip() for c in ln.strip("|").split("|")]
            if all(re.fullmatch(r":?-+:?", c) for c in cells):
                continue
            if not in_table:
                out.append("<table>")
                in_table = True
            out.append("<tr>" + "".join(
                f"<td>{inline(c)}</td>" for c in cells) + "</tr>")
        elif ln.strip() == "":
            out.append("")
        else:
            out.append(f"<p>{inline(ln)}</p>")
    if in_code:
        out.append("</pre>")
    if in_list:
        out.append("</ul>")
    if in_table:
        out.append("</table>")
    return "\n".join(out)


def main():
    os.makedirs(OUT, exist_ok=True)
    index_rows = []

    for modname in MODULES:
        body, summary = _render_module(modname)
        fname = modname.replace(".", "_") + ".html"
        with open(os.path.join(OUT, fname), "w") as f:
            f.write(_page(modname, body))
        index_rows.append(
            f'<tr><td><a href="{fname}"><code>{modname}</code></a></td>'
            f"<td>{html.escape(summary)}</td></tr>")

    prose_rows = []
    for md in PROSE:
        path = os.path.join(REPO, "docs", md)
        if not os.path.exists(path):
            continue
        with open(path) as f:
            body = _md_to_html(f.read())
        fname = md.replace(".md", ".html")
        with open(os.path.join(OUT, fname), "w") as f:
            f.write(_page(md, body))
        prose_rows.append(f'<li><a href="{fname}">{md[:-3]}</a></li>')

    tut_rows = []
    tdir = os.path.join(REPO, "docs", "tutorials")
    if os.path.isdir(tdir):
        for py in sorted(os.listdir(tdir)):
            if not py.endswith(".py"):
                continue
            with open(os.path.join(tdir, py)) as f:
                src = f.read()
            body = f"<h1>{html.escape(py)}</h1><pre>{html.escape(src)}</pre>"
            fname = "tutorial_" + py.replace(".py", ".html")
            with open(os.path.join(OUT, fname), "w") as f:
                f.write(_page(py, body))
            tut_rows.append(f'<li><a href="{fname}">{py}</a></li>')

    index = (
        "<h1>autogp_tpu — API reference</h1>"
        "<p>TPU-native rebuild of AutoGP.jl: Gaussian-process structure "
        "discovery via SMC / involutive MCMC / HMC / greedy search over "
        "symbolic kernel programs, compiled to XLA + Pallas.</p>"
        "<h2>Guides</h2><ul>" + "".join(prose_rows) + "</ul>"
        "<h2>Tutorials</h2><ul>" + "".join(tut_rows) + "</ul>"
        "<h2>Modules</h2><table>" + "".join(index_rows) + "</table>")
    with open(os.path.join(OUT, "index.html"), "w") as f:
        f.write(_page("autogp_tpu API reference", index))
    print(f"wrote {len(MODULES)} module pages + {len(prose_rows)} guides "
          f"+ {len(tut_rows)} tutorials to {OUT}")


if __name__ == "__main__":
    main()
