"""Every trainer/eval command line in the reference's shipped experiment
scripts (script/open_source + script/paper_experiment_final) must parse
under this CLI, and its --method must resolve to an implemented
criterion / plbl generator / analysis eval.

Runs only where the reference checkout is present (this build
environment); it is a spec cross-check, not a unit test of repo code."""

import glob
import os
import re
import shlex

import pytest

from mulactseg_tpu.config import parse_config

REF_SCRIPTS = "/root/reference/script"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_SCRIPTS),
    reason="reference checkout not available")

_BIN = re.compile(
    r"python\s+(train_AL|eval_AL|train_stage2_AL)(_voc)?\.py\s+(.*)")


def _commands():
    for sh in sorted(glob.glob(os.path.join(REF_SCRIPTS, "**", "*.sh"),
                               recursive=True)):
        txt = open(sh, errors="ignore").read().replace("\\\n", " ")
        # shell variables -> a numeric-safe dummy so float/int flags parse
        txt = re.sub(r"\$\{?\w+\}?", "1", txt)
        for line in txt.splitlines():
            line = line.split(" #")[0]  # continuation-joined comments
            m = _BIN.search(line)
            if m:
                yield sh, bool(m.group(2)), shlex.split(m.group(3))


def test_every_reference_experiment_command_parses():
    from mulactseg_tpu.engine.analysis import ANALYSIS_METHODS
    from mulactseg_tpu.engine.train import CRITERIA
    from mulactseg_tpu.plbl.generator import METHOD_TO_PLBL

    known_methods = (set(CRITERIA) | set(METHOD_TO_PLBL)
                     | set(ANALYSIS_METHODS)
                     | {"eval_naive", "eval_slide",
                        "active_joint_multi_analysis"})
    n = 0
    for sh, is_voc, args in _commands():
        if is_voc:
            # the *_voc.py binaries carry utils/common_voc.py defaults
            args = ["--dataset", "voc", "--num_classes", "21",
                    "--crop_size", "513", "513"] + args
        cfg = parse_config(args)
        assert cfg.method in known_methods, (sh, cfg.method)
        n += 1
    # the reference ships dozens of experiment commands; make sure the
    # walker actually saw them
    assert n >= 30, n
