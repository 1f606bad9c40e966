"""Recipe-layer smoke tests (the reference's scripts/steps/utils shell
surface): manifest split/filter utilities and a sharded CLI wrapper."""

import os
import subprocess
from pathlib import Path

import numpy as np
import pytest

from setk_tpu.io.wave import write_wav

RECIPES = Path(__file__).parent.parent / "recipes"


def _sh(args, **kw):
    env = dict(os.environ)
    env["SETK_TPU_PLATFORM"] = "cpu"
    return subprocess.run([str(a) for a in args], check=True,
                          capture_output=True, text=True, env=env, **kw)


def test_split_and_filter_scp(tmp_path):
    scp = tmp_path / "wav.scp"
    scp.write_text("".join(f"utt{i} /x/{i}.wav\n" for i in range(10)))
    outs = [tmp_path / f"s{j}.scp" for j in range(3)]
    _sh([RECIPES / "split_scp.sh", scp, *outs])
    lines = [o.read_text().splitlines() for o in outs]
    assert sorted(sum(lines, [])) == sorted(scp.read_text().splitlines())
    assert abs(len(lines[0]) - len(lines[2])) <= 1

    ids = tmp_path / "keep.txt"
    ids.write_text("utt1\nutt4 whatever\n")
    kept = tmp_path / "kept.scp"
    _sh([RECIPES / "filter_scp.sh", ids, scp, kept])
    assert [l.split()[0] for l in kept.read_text().splitlines()] == \
        ["utt1", "utt4"]
    dropped = tmp_path / "dropped.scp"
    _sh([RECIPES / "filter_scp.sh", "--exclude", "true", ids, scp, dropped])
    assert len(dropped.read_text().splitlines()) == 8


def test_get_wav_duration_recipe(tmp_path, rng):
    lines = []
    for i, n in enumerate((8000, 16000)):
        w = (rng.standard_normal(n) * 0.2).astype(np.float32)
        write_wav(tmp_path / f"u{i}.wav", w)
        lines.append(f"u{i} {tmp_path}/u{i}.wav")
    scp = tmp_path / "wav.scp"
    scp.write_text("\n".join(lines) + "\n")
    utt2dur = tmp_path / "utt2dur"
    _sh([RECIPES / "get_wav_duration.sh", scp, utt2dur])
    durs = dict(l.split() for l in utt2dur.read_text().splitlines())
    assert abs(float(durs["u0"]) - 0.5) < 1e-3
    assert abs(float(durs["u1"]) - 1.0) < 1e-3


def test_sharded_wrapper_runs_cli(tmp_path, rng):
    """--nj 2 splits the manifest and merges per-shard outputs."""
    lines = []
    for i in range(4):
        w = (rng.standard_normal(4000) * 0.2).astype(np.float32)
        write_wav(tmp_path / f"u{i}.wav", w)
        lines.append(f"u{i} {tmp_path}/u{i}.wav")
    scp = tmp_path / "wav.scp"
    scp.write_text("\n".join(lines) + "\n")
    utt2dur = tmp_path / "dur.{JOB}"
    _sh([RECIPES / "get_wav_duration.sh", "--nj", "2", scp,
         str(utt2dur)])
    got = []
    for j in (1, 2):
        got += (tmp_path / f"dur.{j}").read_text().splitlines()
    assert sorted(l.split()[0] for l in got) == [f"u{i}" for i in range(4)]
