"""PPO + tactile-only MAE with frozen-DINO vision (reference
train_dino_tac_mae.py — identical to train_dino_cat_mae.py except the MAE
reconstructs tactile only; SURVEY.md §2.1)."""
from __future__ import annotations

from .train_dino_cat_mae import build_parser as _cat_parser, main as _cat_main


def build_parser():
    parser = _cat_parser()
    parser.set_defaults(tactile_only_mae=True)
    return parser


def main(argv=None):
    argv = list(argv) if argv is not None else None
    if argv is None:
        import sys

        argv = sys.argv[1:]
    if "--tactile_only_mae" not in " ".join(argv):
        argv = argv + ["--tactile_only_mae", "True"]
    return _cat_main(argv)


if __name__ == "__main__":
    main()
