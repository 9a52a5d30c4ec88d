#!/usr/bin/env python
"""SCADE on In-the-Wild / Tanks&Temples scenes — TPU-native CLI.

Differences from the ScanNet runner (reference: run_scade_wild.py vs
run_scade_scannet.py): scenes load via load_scene_processed (no GT depth,
.png depth files), optional --mask_edges border masking, RGB loss masked by
the space-carving mask, and scaleshift_lr defaults to 1e-5.
"""

from run_scade_scannet import main


def main_wild(argv=None):
    """Console-script entry (`scade-wild`): the wild variant of main()."""
    main("wild", argv)


if __name__ == "__main__":
    main_wild()
