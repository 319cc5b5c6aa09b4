#!/usr/bin/env python
"""Convert a gta-tpu checkpoint into a reference-framework `model.pt`
(loadable by /root/reference's Checkpoint.load and evaluate.py — e.g. to
run the reference's LPIPS evaluation on a model trained here).

    python scripts/export_reference_checkpoint.py \
        runs/clevrtr/GTA/gta/config.yaml runs_out/my_run out/model.pt

Weights + scalar training state always export. To also export the AdamW
moments (so the reference resumes training seamlessly), pass
--optimizer-order-from with ANY reference checkpoint of the same
architecture — torch indexes optimizer state by parameter position, which
only a real reference file can pin down. See gta_tpu/utils/ref_import.py.
"""

import argparse


def main():
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("config", help="the run's config.yaml")
    p.add_argument("run_dir", help="gta-tpu run directory (containing ckpts/)")
    p.add_argument("out_pt", help="path of the model.pt to write")
    p.add_argument("--name", default="latest", help="checkpoint slot to read (latest|best|step_N)")
    p.add_argument(
        "--optimizer-order-from",
        default=None,
        help="a reference model.pt of the same architecture; enables AdamW moment export",
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
    from gta_tpu.utils.ref_import import export_reference_checkpoint

    scalars = export_reference_checkpoint(
        args.config,
        args.run_dir,
        args.out_pt,
        name=args.name,
        optimizer_order_from=args.optimizer_order_from,
        trusted=args.trusted,
    )
    print(f"Exported {args.run_dir}/ckpts/{args.name} -> {args.out_pt} (it={scalars.get('it')})")


if __name__ == "__main__":
    main()
