"""S10 interactive source: recognize --interactive reads paths from
stdin, emits one JSON per line, survives bad paths, loads the model once."""

from __future__ import annotations

import json
import os
import subprocess
import sys

from vietnamese_ocr_spark.functions.imaging import png_encode
from vietnamese_ocr_spark.model.glyphs import build_atlas, render_line
from vietnamese_ocr_spark.model.vocab import Vocabulary

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_interactive_recognize_session(tmp_path):
    vocab = Vocabulary()
    word = "".join(vocab.letters[:4])
    png = str(tmp_path / "a.png")
    with open(png, "wb") as f:
        f.write(png_encode(render_line(word, 64, build_atlas(vocab))))

    out = subprocess.run(
        [sys.executable, "-m", "vietnamese_ocr_spark", "recognize", "--interactive"],
        input=f"{png}\n{tmp_path}/missing.png\n{png}\n",
        capture_output=True,
        text=True,
        cwd=REPO,
        check=True,
    )
    lines = [json.loads(l) for l in out.stdout.strip().splitlines()]
    assert lines[0]["text"] == word and lines[0]["decode_ok"]
    assert "error" in lines[1]  # bad path reported, session survives
    assert lines[2] == lines[0]
