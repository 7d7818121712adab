"""Native (JVM ImageIO) JPEG seam parity (VERDICT r10 item 7): the
sidecar decoder behind SPARK_GRAFT_JPEG_DECODER=imageio must (a) match
the pure T.81 decoder BIT-EXACTLY on DC-only streams — the registered
llm_multimodal_jpeg corpus, so the driver hash is decoder-invariant —
and (b) stay within the conformance fixtures' IDCT-rounding tolerance
(|diff| <= 2) on AC-bearing external JPEGs."""

from __future__ import annotations

import json
import pathlib
import shutil

import numpy as np
import pytest

if shutil.which("javac") is None or shutil.which("java") is None:
    pytest.skip("no JDK on PATH for the ImageIO sidecar", allow_module_level=True)

from pipelinejobs_indexer_spark.llm.jpeg import decode_jpeg, synth_dc_jpeg
from pipelinejobs_indexer_spark.llm.native_jpeg import (
    decode_jpeg_native,
    shutdown,
)

FIXDIR = pathlib.Path(__file__).parent / "fixtures" / "conformance"
MANIFEST = json.loads((FIXDIR / "manifest.json").read_text())
JPEGS = [m for m in MANIFEST if m["format"] == "jpeg"]


@pytest.fixture(scope="module", autouse=True)
def _sidecar():
    yield
    shutdown()


def test_dc_only_corpus_bit_exact():
    from pipelinejobs_indexer_spark.llm.jpeg import synth_progressive_jpeg
    from pipelinejobs_indexer_spark.llm.multimodal import JPEG_Q, _jpeg_dcs

    for d in range(64):
        jpg = synth_dc_jpeg([_jpeg_dcs(d)], 16, 16, q=JPEG_Q)
        assert decode_jpeg(jpg) == decode_jpeg_native(jpg), d
        # the progressive (SOF2) corpus rides the same seam
        blocks = [(dc, 1, 0) for dc in _jpeg_dcs(d)]
        prog = synth_progressive_jpeg(
            blocks, 16, 16, q=JPEG_Q, refine_dc=(d % 2 == 1)
        )
        assert decode_jpeg(prog) == decode_jpeg_native(prog), d


def test_conformance_corpus_within_idct_rounding():
    assert JPEGS, "manifest must carry JPEG fixtures"
    checked = 0
    for m in JPEGS:
        raw = (FIXDIR / m["file"]).read_bytes()
        try:
            ph, pw, pnc, ppx = decode_jpeg(raw)
        except NotImplementedError:
            continue  # modes the pure decoder refuses have no seam
        nh, nw, nnc, npx = decode_jpeg_native(raw)
        assert (ph, pw, pnc) == (nh, nw, nnc), m["name"]
        a = np.array(ppx, dtype=int).reshape(ph, pw, -1)
        b = np.array(npx, dtype=int).reshape(nh, nw, -1)
        assert np.abs(a - b).max() <= 2, (m["name"], int(np.abs(a - b).max()))
        checked += 1
    assert checked > 0


def test_decode_error_is_loud_and_pipe_survives():
    with pytest.raises(ValueError, match="ImageIO"):
        decode_jpeg_native(b"\xff\xd8not a real jpeg")
    # the sidecar must keep serving after an error response
    from pipelinejobs_indexer_spark.llm.multimodal import JPEG_Q, _jpeg_dcs

    jpg = synth_dc_jpeg([_jpeg_dcs(5)], 16, 16, q=JPEG_Q)
    assert decode_jpeg_native(jpg) == decode_jpeg(jpg)
