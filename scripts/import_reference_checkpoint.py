#!/usr/bin/env python
"""Convert a reference-framework checkpoint (`model.pt` written by the
reference's Checkpoint.save — /root/reference/source/checkpoint.py:21-35)
into a gta-tpu run directory.

    python scripts/import_reference_checkpoint.py \
        runs/clevrtr/GTA/gta/config.yaml /path/to/model.pt out_runs/imported

Afterwards `python train.py <config> --outdir out_runs/imported` resumes
from the imported weights AND optimizer moments at the reference's
iteration count, and `python evaluate.py` evaluates them. See
gta_tpu/utils/ref_import.py for the translation rules (validated by
tests/test_reference_parity.py and tests/test_ref_import.py).
"""

import argparse


def main():
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("config", help="the run's config.yaml (same one the reference trained with)")
    p.add_argument("model_pt", help="reference model.pt / model_<it>.pt / model_best.pt")
    p.add_argument("outdir", help="gta-tpu run directory to create")
    p.add_argument(
        "--name",
        default="latest",
        help="checkpoint slot to write (latest|best|step_N; default latest = auto-resume slot)",
    )
    p.add_argument(
        "--no-optimizer",
        action="store_true",
        help="skip the AdamW moment transplant (fresh optimizer state)",
    )
    p.add_argument(
        "--trusted",
        action="store_true",
        help="allow full unpickling of the .pt (can execute embedded code; "
        "needed for checkpoints from old torch versions carrying numpy scalars)",
    )
    args = p.parse_args()

    from gta_tpu.runtime import setup

    setup()
    from gta_tpu.utils.ref_import import import_reference_checkpoint

    scalars, counts = import_reference_checkpoint(
        args.config,
        args.model_pt,
        args.outdir,
        import_optimizer=not args.no_optimizer,
        name=args.name,
        trusted=args.trusted,
    )
    print(
        f"Imported {args.model_pt} -> {args.outdir}/ckpts/{args.name} "
        f"(it={scalars['it']}, params: encoder {counts['encoder']:,} / "
        f"decoder {counts['decoder']:,})"
    )


if __name__ == "__main__":
    main()
