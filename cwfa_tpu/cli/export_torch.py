"""Export trained cwfa_tpu checkpoints as REFERENCE PyTorch checkpoints.

The reverse-migration entry point (engine/torch_export.py): turn a
directory of our ``model_step_<s>__ep_<e>.msgpack`` checkpoints into the
reference's exact ``model_step_<s>__ep_<e>`` torch files — loadable by the
reference's ``load_INN_steps`` + strict ``load_state_dict``
(networks.py:708-756), so a model trained or finetuned on TPU can be
handed back to a reference deployment.

The architecture config, normalization statistics, and epoch come from the
checkpoints themselves (they ride in every file, matching the reference's
'args'/'training_statistics' payload convention).

Usage:
    python -m cwfa_tpu.cli.export_torch \
        --pretrain_models_path <msgpack_ckpt_dir> --output_path <dir>
"""

from __future__ import annotations

import argparse


def main(argv=None):
    import jax

    from cwfa_tpu.engine.checkpoints import (discover_checkpoints,
                                             load_step_checkpoint,
                                             restore_like)
    from cwfa_tpu.engine.torch_export import export_torch_checkpoints
    from cwfa_tpu.models.cwfa_model import CWFAModel

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--pretrain_models_path", required=True,
                   help="directory of cwfa_tpu .msgpack step checkpoints")
    p.add_argument("--output_path", required=True,
                   help="directory for the reference torch checkpoint set")
    p.add_argument("--max_test_load_epoch", type=int, default=25000,
                   help="epoch cap on checkpoint discovery")
    args = p.parse_args(argv)

    found = discover_checkpoints(args.pretrain_models_path,
                                 max_epoch=args.max_test_load_epoch)
    found = {s: (e, f) for s, (e, f) in found.items()
             if f.endswith(".msgpack")}
    if not found:
        raise SystemExit(
            f"no .msgpack step checkpoints under {args.pretrain_models_path}")

    # architecture + stats from the first checkpoint's payload
    _, cfg, stats = load_step_checkpoint(sorted(found.values())[0][1])
    model = CWFAModel.build(cfg)
    params, mstate = model.init(jax.random.PRNGKey(0))
    nf = model.n_flow_steps
    max_epoch = 0
    for step, (ep, fname) in sorted(found.items()):
        payload, _, st = load_step_checkpoint(fname)
        stats = stats or st
        max_epoch = max(max_epoch, int(ep))
        ix = step - 1
        if ix < nf and payload["INN_state_dict"]:
            flow = list(params["flow"])
            flow[ix] = restore_like(flow[ix], payload["INN_state_dict"])
            params = {**params, "flow": flow}
        if payload["condition_state_dict"]:
            if ix >= nf:
                params = {**params, "lrnn": restore_like(
                    params["lrnn"], payload["condition_state_dict"])}
            else:
                cond = list(params["cond"])
                cond[ix] = restore_like(cond[ix],
                                        payload["condition_state_dict"])
                params = {**params, "cond": cond}
        ms = payload.get("model_state_dict")
        if ms and ix >= nf:
            mstate = {"lrnn": restore_like(mstate["lrnn"], ms)}

    written = export_torch_checkpoints(args.output_path, cfg, model, params,
                                       mstate, stats=stats, epoch=max_epoch)
    for w in written:
        print(w)
    print(f"exported {len(written)} reference checkpoints "
          f"(epoch {max_epoch}) to {args.output_path}")


if __name__ == "__main__":
    main()
