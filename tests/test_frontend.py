"""Structural contract tests for the Next.js frontend sources.

The container has no node/npm (frontend/README.md), so the TS app cannot be
type-checked or built here — these tests verify the things that actually
break integrations instead: the API contract the client speaks, the model
list, the cGAN conditioning parameters, the upload limit, and import
integrity across the componentized sources.  They parse the checked-in
TS/TSX as text; a behavioral UI test exists separately for the dependency-
free `/ui` page (tests/test_serve.py::test_static_ui_cgan_condition_fields).

Reference behaviors mirrored (frontend/src/app/page.tsx of the reference):
the 4-model tab set and sequential Run-All (page.tsx:124-135), forced
`cgan_backend=keras` + default label 5 (page.tsx:58-63,88-92), both response
key spellings (page.tsx:101-104), the 50 MB limit (page.tsx:345).
"""

import os
import re

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_REPO, "frontend", "src")


def _read(*parts: str) -> str:
    path = os.path.join(_SRC, *parts)
    if not os.path.isfile(path):
        pytest.fail(f"missing frontend source {path}")
    with open(path, encoding="utf-8") as f:
        return f.read()


def test_api_client_speaks_the_enhance_contract():
    api = _read("lib", "api.ts")
    # endpoint + multipart field names the server parses
    assert "/enhance?" in api
    assert re.search(r"""form\.append\(\s*["']file["']""", api)
    assert re.search(r"""form\.append\(\s*["']cond_file["']""", api)
    # the reference forces the Keras backend for cGAN (page.tsx:61) and
    # defaults the class label to 5 (page.tsx:88-92)
    assert re.search(r"""["']cgan_backend["']\s*,\s*["']keras["']""", api)
    assert re.search(r"label\s*\?\?\s*5", api)
    # both key spellings of the response contract are accepted
    # (reference page.tsx:101-104)
    assert "denoised_image_base64" in api and "output_image_base64" in api
    assert "noise_graph_base64" in api and "analysis_graph_base64" in api
    assert re.search(r"\bbackend\b", api)
    # 50 MB upload cap (reference page.tsx:345 / backend app.py:374-375)
    assert re.search(r"MAX_UPLOAD_BYTES\s*=\s*50\s*\*\s*1024\s*\*\s*1024",
                     api)


def test_frontend_contract_keys_match_the_server():
    """The literal response keys the TS client reads must be the ones the
    Python handlers emit — the cross-language seam nothing else checks."""
    api = _read("lib", "api.ts")
    with open(os.path.join(
            _REPO, "celebrity_image_denoiser_tpu", "serve",
            "handlers.py"), encoding="utf-8") as f:
        handlers = f.read()
    for key in ("denoised_image_base64", "noise_graph_base64", "backend"):
        assert key in api and key in handlers, key


def test_model_tabs_match_the_served_models():
    api = _read("lib", "api.ts")
    m = re.search(r"MODELS\s*=\s*\[([^\]]*)\]", api)
    assert m, "MODELS list not found in lib/api.ts"
    models = re.findall(r"""["'](\w+)["']""", m.group(1))
    # the reference UI's four tabs, in its order (page.tsx:126-135)
    assert models == ["denoise", "cgan", "srgan", "esrgan"]


def test_page_runs_the_full_pipeline_sequentially():
    page = _read("app", "page.tsx")
    # sequential for..of with await — the reference runs models one at a
    # time "to manage GPU/CPU" (page.tsx:123); a Promise.all here would
    # stampede the accelerator
    assert re.search(r"for\s*\(const\s+\w+\s+of\s+MODELS\)", page)
    assert "await runOne" in page
    assert "Promise.all" not in page
    # cGAN conditioning UI exists and is cgan-scoped
    assert re.search(r"""active\s*===\s*["']cgan["']""", page)
    assert "cond_file" in _read("lib", "api.ts")


def test_upload_zone_enforces_the_limit():
    zone = _read("components", "UploadZone.tsx")
    assert "MAX_UPLOAD_BYTES" in zone
    assert re.search(r"size\s*>\s*MAX_UPLOAD_BYTES", zone)


def test_component_imports_resolve():
    """Every `@/`-aliased import in the app maps to a real file — the class
    of breakage (renamed/deleted component) a build would catch."""
    sources = []
    for root, _, files in os.walk(_SRC):
        for fn in files:
            if fn.endswith((".ts", ".tsx")):
                sources.append(os.path.join(root, fn))
    assert len(sources) >= 5  # page, layout, api, 2 components
    for path in sources:
        with open(path, encoding="utf-8") as f:
            text = f.read()
        for mod in re.findall(r"""from\s+["']@/([^"']+)["']""", text):
            base = os.path.join(_SRC, mod)
            assert any(os.path.isfile(base + ext)
                       for ext in (".ts", ".tsx", ".css", "")), (
                f"{path} imports @/{mod}, which resolves to nothing")
        # default exports exist where pages/components are imported
    for comp in ("app/page.tsx", "app/layout.tsx",
                 "components/ResultCard.tsx", "components/UploadZone.tsx"):
        assert "export default" in _read(*comp.split("/")), comp
