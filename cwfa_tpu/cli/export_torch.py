"""Export trained cwfa_tpu checkpoints as REFERENCE PyTorch checkpoints.

The reverse-migration entry point (engine/torch_export.py): turn a
directory of our ``model_step_<s>__ep_<e>.msgpack`` checkpoints into the
reference's exact ``model_step_<s>__ep_<e>`` torch files — loadable by the
reference's ``load_INN_steps`` + strict ``load_state_dict``
(networks.py:708-756), so a model trained or finetuned on TPU can be
handed back to a reference deployment.

The architecture config, normalization statistics, and epoch come from the
checkpoints themselves (they ride in every file, matching the reference's
'args'/'training_statistics' payload convention).  Every pyramid step
MUST have a checkpoint: a step silently exported from random init would
strict-load into the reference and reconstruct garbage, so missing steps
are a hard error.

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
                                             restore_params_from_payloads)
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

    # discover ONLY msgpack files: filtering a mixed-format directory
    # after highest-epoch selection could silently drop a step whose best
    # epoch lives in a reference torch file
    found = discover_checkpoints(args.pretrain_models_path,
                                 prefix="model_step_*__ep_*.msgpack",
                                 max_epoch=args.max_test_load_epoch)
    if not found:
        raise SystemExit(
            f"no .msgpack step checkpoints under {args.pretrain_models_path}")

    # architecture from the first checkpoint's payload
    _, cfg, _ = load_step_checkpoint(sorted(found.values())[0][1])
    model = CWFAModel.build(cfg)
    nf = model.n_flow_steps
    missing = [s for s in range(1, nf + 2) if s not in found]
    if missing:
        raise SystemExit(
            f"steps {missing} have no .msgpack checkpoint under "
            f"{args.pretrain_models_path} (found steps {sorted(found)}); "
            "exporting them would write random-init weights the reference "
            "strict-loads without complaint")

    params, mstate = model.init(jax.random.PRNGKey(0))
    params, mstate, stats, max_epoch = restore_params_from_payloads(
        found, model, params, mstate)

    # Lion momenta ride in our msgpack checkpoints (trainer.save_checkpoints)
    # — export them in lion_pytorch layout so a reference-side resume can
    # keep them (the reference itself always serializes optimizer=None,
    # CWFA.py:1173,1283; this is strictly more than it preserves).
    from cwfa_tpu.engine.checkpoints import restore_like
    from cwfa_tpu.engine.trainer import make_optimizers
    tx_flow, _, tx_lrnn = make_optimizers(model)
    opt_momenta = {"flow": [None] * nf, "lrnn": None}
    for step, (_, fname) in found.items():
        payload, _, _ = load_step_checkpoint(fname)
        osd = payload.get("optimizer_state_dict")
        if not osd:
            continue
        ix = step - 1
        try:
            if ix < nf:
                st = restore_like(tx_flow.init(params["flow"][ix]),
                                  osd["flow"])
                opt_momenta["flow"][ix] = st[0].mu
            else:
                st = restore_like(tx_lrnn.init(params["lrnn"]), osd)
                opt_momenta["lrnn"] = st[0].mu
        except (KeyError, ValueError, TypeError):
            pass    # architecture drift: params still export, momenta skip

    written = export_torch_checkpoints(args.output_path, cfg, model, params,
                                       mstate, stats=stats, epoch=max_epoch,
                                       opt_momenta=opt_momenta)
    for w in written:
        print(w)
    print(f"exported {len(written)} reference checkpoints "
          f"(epoch {max_epoch}) to {args.output_path}")


if __name__ == "__main__":
    main()
