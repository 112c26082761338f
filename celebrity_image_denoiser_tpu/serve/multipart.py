"""Minimal multipart/form-data parser (stdlib-only).

Python 3.13 removed ``cgi``; FastAPI isn't a baked dependency here.  This
covers the subset the /enhance contract needs: file fields (bytes +
content-type) and plain form fields.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple


class Part:
    def __init__(self, name: str, data: bytes, filename: Optional[str],
                 content_type: Optional[str]):
        self.name = name
        self.data = data
        self.filename = filename
        self.content_type = content_type


def parse_multipart(body: bytes, content_type_header: str) -> Dict[str, Part]:
    """Returns {field_name: Part}.  Raises ValueError on malformed input."""
    boundary = None
    for piece in content_type_header.split(";"):
        piece = piece.strip()
        if piece.startswith("boundary="):
            boundary = piece[len("boundary="):].strip('"')
            break
    if not boundary:
        raise ValueError("missing multipart boundary")
    delim = b"--" + boundary.encode()
    parts: Dict[str, Part] = {}
    for chunk in body.split(delim):
        # framing is exactly one CRLF after the boundary line and one before
        # the next boundary; strip only those — a blanket strip(b"\r\n")
        # would eat payload bytes of binary files ending in 0x0d/0x0a
        if chunk.startswith(b"\r\n"):
            chunk = chunk[2:]
        elif chunk.startswith(b"\n"):
            chunk = chunk[1:]
        if chunk.endswith(b"\r\n"):
            chunk = chunk[:-2]
        elif chunk.endswith(b"\n"):
            chunk = chunk[:-1]
        if not chunk or chunk in (b"--", b"--\r\n"):
            continue
        if b"\r\n\r\n" not in chunk:
            continue
        header_blob, data = chunk.split(b"\r\n\r\n", 1)
        headers = {}
        for line in header_blob.split(b"\r\n"):
            if b":" in line:
                k, v = line.split(b":", 1)
                headers[k.decode().strip().lower()] = v.decode().strip()
        disp = headers.get("content-disposition", "")
        name, filename = None, None
        for item in disp.split(";"):
            item = item.strip()
            if item.startswith("name="):
                name = item[5:].strip('"')
            elif item.startswith("filename="):
                filename = item[9:].strip('"')
        if name is None:
            continue
        parts[name] = Part(name, data, filename, headers.get("content-type"))
    return parts
