"""Build the browsable HTML docs site from ``docs/`` + ``mkdocs.yml``.

The reference ships a Sphinx site (reference ``docs/source/conf.py``);
this environment has neither sphinx nor mkdocs installed, so this is a
self-contained static builder over the same inputs: it renders every
``docs/**/*.md`` page (including the generated ``docs/reference/``
API pages) with python-markdown, wraps them in a navigation shell
driven by ``mkdocs.yml``'s ``nav``, rewrites ``.md`` links to
``.html``, and copies notebooks verbatim. On machines where mkdocs IS
installed, ``mkdocs build`` consumes the identical config.

Usage: ``python tools/build_docs_site.py [--out DIR]`` (default
``site/``). Exit code is non-zero if any page fails to render or an
internal link is broken, so the suite can gate on it
(``tests/test_docs_site.py``).
"""

from __future__ import annotations

import argparse
import os
import re
import shutil
import sys

import markdown
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

EXTENSIONS = ["tables", "fenced_code", "toc", "admonition", "sane_lists"]

TEMPLATE = """<!DOCTYPE html>
<html lang="en">
<head>
<meta charset="utf-8">
<meta name="viewport" content="width=device-width, initial-scale=1">
<title>{title} — differt2d_tpu</title>
<style>
body {{ margin: 0; font: 16px/1.55 system-ui, sans-serif; color: #1a1a2e; }}
.wrap {{ display: flex; min-height: 100vh; }}
nav {{ width: 250px; flex-shrink: 0; background: #f4f4f8; padding: 1.2rem;
      border-right: 1px solid #ddd; }}
nav h1 {{ font-size: 1.1rem; margin: 0 0 .8rem; }}
nav ul {{ list-style: none; padding-left: .8rem; margin: .2rem 0; }}
nav > ul {{ padding-left: 0; }}
nav li {{ margin: .15rem 0; }}
nav a {{ color: #27456e; text-decoration: none; }}
nav a:hover {{ text-decoration: underline; }}
main {{ flex: 1; max-width: 54rem; padding: 1.5rem 2.5rem 4rem; min-width: 0; }}
main pre {{ background: #f6f8fa; padding: .8rem 1rem; overflow-x: auto;
           border-radius: 6px; font-size: .88em; }}
main code {{ background: #f6f8fa; padding: .08em .3em; border-radius: 4px;
            font-size: .92em; }}
main pre code {{ background: none; padding: 0; }}
main table {{ border-collapse: collapse; display: block; overflow-x: auto; }}
main th, main td {{ border: 1px solid #ccc; padding: .35rem .6rem;
                   text-align: left; }}
main h1, main h2, main h3 {{ line-height: 1.25; }}
main a {{ color: #1458b3; }}
</style>
</head>
<body>
<div class="wrap">
<nav>
<h1><a href="{root}index.html">differt2d_tpu</a></h1>
{nav}
</nav>
<main>
{body}
</main>
</div>
</body>
</html>
"""


def _md_to_html_name(path: str) -> str:
    return re.sub(r"\.md$", ".html", path)


def _render_nav(nav, root: str) -> str:
    """Render mkdocs-style nav (list of {title: target-or-sublist})."""
    items = []
    for entry in nav:
        (title, target), = entry.items()
        if isinstance(target, str):
            href = root + _md_to_html_name(target)
            items.append(f'<li><a href="{href}">{title}</a></li>')
        else:
            items.append(
                f"<li>{title}{_render_nav(target, root)}</li>"
            )
    return "<ul>" + "".join(items) + "</ul>"


def _rewrite_links(html: str, root: str, base: str, is_meta: bool) -> str:
    """Point relative ``*.md`` links at the rendered ``*.html`` pages.

    ``base`` is the page's directory inside the site. Docs links that
    resolve above ``docs/`` (e.g. ``../BASELINE.md``) are redirected to
    that document's rendered copy under ``meta/`` (every repo-root
    ``*.md`` is rendered there). Meta pages themselves (the repo-root
    documents) link relative to the repo root, so their ``docs/X``
    links map to the site root and sibling ``Y.md`` links stay in
    ``meta/``.
    """

    def sub(m):
        href = m.group(2)
        if "://" in href or href.startswith(("mailto:", "#", "/")):
            return m.group(0)
        path, _, frag = href.partition("#")
        frag = "#" + frag if frag else ""
        if is_meta:
            if path.startswith("docs/"):
                path = "../" + path[len("docs/"):]
            elif path.endswith(".md"):
                path = os.path.basename(path)
            # other repo files (sources, notebooks) keep their repo-
            # relative path; the integrity pass copies them into meta/.
        else:
            resolved = os.path.normpath(os.path.join(base, path))
            if resolved.startswith(".."):
                # A docs page linking a repo-root artifact: .md targets
                # have rendered copies under meta/, anything else is
                # copied there verbatim by the integrity pass.
                path = root + "meta/" + os.path.basename(path)
        if path.endswith(".md"):
            path = _md_to_html_name(path)
        return f'{m.group(1)}{path}{frag}"'

    return re.sub(r'(href=")([^"]+)"', sub, html)


def build(docs_dir: str, out_dir: str, config_path: str) -> list[str]:
    """Render the site; return a list of error strings (empty = success)."""
    with open(config_path) as f:
        config = yaml.safe_load(f)
    nav = config.get("nav", [])
    errors: list[str] = []
    pages: list[str] = []

    for dirpath, _dirnames, filenames in os.walk(docs_dir):
        rel_dir = os.path.relpath(dirpath, docs_dir)
        for name in sorted(filenames):
            rel = os.path.normpath(os.path.join(rel_dir, name))
            src = os.path.join(dirpath, name)
            if name.endswith(".md"):
                pages.append(rel)
            elif name.endswith(".ipynb"):
                dst = os.path.join(out_dir, rel)
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                shutil.copyfile(src, dst)

    # Repo-root documents (README, CHANGELOG, PARITY, BASELINE, ...) are
    # link targets of docs pages; render them under meta/.
    repo_root = os.path.dirname(os.path.abspath(docs_dir))
    meta_sources = {}
    for name in sorted(os.listdir(repo_root)):
        if name.endswith(".md"):
            rel = os.path.join("meta", name)
            pages.append(rel)
            meta_sources[rel] = os.path.join(repo_root, name)

    rendered: set[str] = set()
    for rel in pages:
        src = meta_sources.get(rel, os.path.join(docs_dir, rel))
        depth = rel.count(os.sep)
        root = "../" * depth
        try:
            with open(src, encoding="utf-8") as f:
                text = f.read()
            body = markdown.markdown(text, extensions=EXTENSIONS)
        except Exception as e:  # render failure gates the build
            errors.append(f"{rel}: {type(e).__name__}: {e}")
            continue
        m = re.search(r"<h1[^>]*>(.*?)</h1>", body, re.S)
        title = re.sub(r"<[^>]+>", "", m.group(1)) if m else rel
        html = TEMPLATE.format(
            title=title,
            root=root,
            nav=_render_nav(nav, root),
            body=body,
        )
        html = _rewrite_links(
            html, root, os.path.dirname(rel), rel in meta_sources
        )
        dst = os.path.join(out_dir, _md_to_html_name(rel))
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        with open(dst, "w", encoding="utf-8") as f:
            f.write(html)
        rendered.add(_md_to_html_name(rel).replace(os.sep, "/"))

    # Internal-link integrity: every relative href must resolve to a
    # produced file (anchors stripped; external and mailto skipped).
    # Links into meta/ that point at real repo files (sources,
    # notebooks linked from README etc.) are copied in on demand.
    for rel in sorted(rendered):
        path = os.path.join(out_dir, rel)
        with open(path, encoding="utf-8") as f:
            html = f.read()
        base = os.path.dirname(rel)
        for m in re.finditer(r'href="([^"]+)"', html):
            href = m.group(1).split("#")[0]
            if not href or "://" in href or href.startswith("mailto:"):
                continue
            target = os.path.normpath(os.path.join(base, href))
            dst = os.path.join(out_dir, target)
            if os.path.exists(dst):
                continue
            parts = target.replace(os.sep, "/").split("/")
            if parts[0] == "meta" and len(parts) > 1:
                src = os.path.join(repo_root, *parts[1:])
                if os.path.isfile(src):
                    os.makedirs(os.path.dirname(dst), exist_ok=True)
                    shutil.copyfile(src, dst)
                    continue
            errors.append(f"{rel}: broken link -> {href}")

    return errors


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--out", default=os.path.join(REPO, "site"))
    parser.add_argument(
        "--docs", default=os.path.join(REPO, "docs"), help=argparse.SUPPRESS
    )
    parser.add_argument(
        "--config",
        default=os.path.join(REPO, "mkdocs.yml"),
        help=argparse.SUPPRESS,
    )
    args = parser.parse_args()
    errors = build(args.docs, args.out, args.config)
    n_pages = sum(
        len([f for f in fs if f.endswith(".html")])
        for _, _, fs in os.walk(args.out)
    )
    if errors:
        for err in errors:
            print(f"ERROR: {err}", file=sys.stderr)
        print(f"site build FAILED ({len(errors)} errors)", file=sys.stderr)
        return 1
    print(f"site built: {n_pages} pages -> {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
