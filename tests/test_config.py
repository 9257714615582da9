"""Reference config-corpus compatibility (locks in the PARITY.md claim).

Every `config/*.txt` in the reference repo must parse through our CLI
parser under the subcommand the reference would run it with
(reference: main.py:33-48 subcommands, @file args via
utils.py:67-83 `convert_arg_line_to_args`).
"""
import glob
import os

import pytest

from miner_tpu.config import make_parser

REF_CONFIG_DIR = "/root/reference/config"

pytestmark = pytest.mark.smoke


def _mode_for(name: str) -> str:
    """The subcommand the reference runs each config file under: fastformer /
    unbert / unisrec configs go through train_fastformer / eval_fastformer
    (reference main.py:13-26), pretrain_* through pretrain (main.py:28-30)."""
    base = os.path.basename(name)
    multi = any(k in base for k in ("fastformer", "unbert", "unisrec"))
    if base.startswith("pretrain"):
        return "pretrain"
    if base.startswith("eval"):
        return "eval_fastformer" if multi else "eval"
    return "train_fastformer" if multi else "train"


def _corpus():
    files = sorted(glob.glob(os.path.join(REF_CONFIG_DIR, "*.txt")))
    if not files:
        pytest.skip("reference config corpus not present")
    return files


@pytest.mark.skipif(not os.path.isdir(REF_CONFIG_DIR),
                    reason="reference repo not mounted")
@pytest.mark.parametrize("path", sorted(
    glob.glob(os.path.join(REF_CONFIG_DIR, "*.txt"))),
    ids=lambda p: os.path.basename(p))
def test_reference_config_parses(path):
    parser = make_parser()
    args = parser.parse_args([_mode_for(path), f"@{path}"])
    assert args.mode == _mode_for(path)
    # every config names a tokenizer and a seed — spot-check the namespace
    # actually carried values through the @file indirection
    assert getattr(args, "pretrained_tokenizer", None) or \
        getattr(args, "model_path", None) is not None


def test_corpus_size_is_complete():
    # the reference ships 39 config files (SURVEY §2.5); if this moves, the
    # parametrized list above silently shrank — fail loudly instead
    assert len(_corpus()) == 39
