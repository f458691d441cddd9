"""Gate on the docs site build (reference ships a Sphinx site,
``/root/reference/docs/source/conf.py``; here the equivalent is
``mkdocs.yml`` + the self-contained ``tools/build_docs_site.py``).

The build itself fails on any unrenderable page or broken internal
link, so the main assertion is simply that it succeeds; on top, every
public module's generated API page must exist and render.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def site(tmp_path_factory):
    out = tmp_path_factory.mktemp("site")
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "build_docs_site.py"),
            "--out",
            str(out),
        ],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr
    return out


def test_site_builds_and_has_core_pages(site):
    for page in [
        "index.html",
        "quickstart.html",
        "architecture.html",
        "performance.html",
        "api.html",
        "reference/index.html",
        "meta/README.html",
        "meta/CHANGELOG.html",
    ]:
        assert (site / page).exists(), f"missing {page}"


def test_every_public_module_page_renders(site):
    """One rendered reference page per public module (the same module
    list the generator is completeness-gated on)."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        from gen_api_docs import MODULES
    finally:
        sys.path.pop(0)
    assert len(MODULES) >= 20
    for mod in MODULES:
        page = site / "reference" / f"{mod}.html"
        assert page.exists(), f"missing reference page for {mod}"
        text = page.read_text(encoding="utf-8")
        assert mod in text


def test_notebooks_copied(site):
    assert (site / "notebooks" / "path_sampler.ipynb").exists()
    assert (site / "notebooks" / "city_coverage.html").exists()


def test_meta_page_source_file_links_copied(tmp_path):
    """Repo-root pages may link non-markdown repo files (e.g. README ->
    bench.py); the builder copies them into meta/ instead of failing
    the link check."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        from build_docs_site import build
    finally:
        sys.path.pop(0)
    repo = tmp_path / "repo"
    (repo / "docs").mkdir(parents=True)
    (repo / "docs" / "index.md").write_text("# hi\n[readme](../README.md)\n")
    (repo / "README.md").write_text(
        "# readme\n[driver](bench.py) [docs](docs/index.md)\n"
    )
    (repo / "bench.py").write_text("print('hi')\n")
    (repo / "mkdocs.yml").write_text("nav:\n  - Home: index.md\n")
    out = tmp_path / "site"
    errors = build(str(repo / "docs"), str(out), str(repo / "mkdocs.yml"))
    assert errors == []
    assert (out / "meta" / "bench.py").exists()
    assert (out / "meta" / "README.html").exists()
