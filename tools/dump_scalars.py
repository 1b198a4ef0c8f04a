"""Dump TensorBoard scalars from a training run as plain text.

Usage: python tools/dump_scalars.py output/synth_run
Prints one line per event: `tag step value` — used to record the PSNR
trajectory of training runs in DEVNOTES/README without needing a TB UI.
"""

import glob
import sys

from tensorboard.backend.event_processing import event_accumulator


def main():
    run_dir = sys.argv[1]
    for path in sorted(glob.glob(f"{run_dir}/events.out.tfevents.*")):
        acc = event_accumulator.EventAccumulator(
            path, size_guidance={"scalars": 0}
        )
        acc.Reload()
        for tag in acc.Tags()["scalars"]:
            for ev in acc.Scalars(tag):
                print(f"{tag} {ev.step} {ev.value:.4f}")


if __name__ == "__main__":
    main()
