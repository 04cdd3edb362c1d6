"""Score a checkpoint's eval renders against the BAND-LIMITED ground
truth (supersampled analytic re-render, tools/analyze_gt_aliasing.py
--save) alongside the shipped 1-spp GT.

The 1-spp GT carries view-incoherent speckle above Nyquist (ceiling
analysis in docs/RESULTS_240_30K.md); a smooth reconstruction that is
CORRECT scores higher against the supersampled reference than against
the aliased GT it trained on. The pair of numbers separates model error
from dataset aliasing:

    PSNR(pred, gt_1spp)  — the conventional (aliasing-polluted) metric
    PSNR(pred, gt_ss)    — fidelity to the actual scene

Run AFTER a training run has released the TPU (single-tenant).
"""

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    run_cfg = Path(sys.argv[1] if len(sys.argv) > 1 else
                   "/root/runs/r4_quality/raytraced240/gaussian-splatting/"
                   "config.yml")
    gts_path = Path("/root/runs/gtS_eval.npz")
    import jax.numpy as jnp

    from gstk_tpu.configs.serialize import load_config
    from gstk_tpu.data.datamanager import FullImageDatamanager
    from gstk_tpu.render.renderer import Renderer
    from gstk_tpu.scripts.eval import batched_eval
    from gstk_tpu.utils.colors import EVAL_BACKGROUND
    from gstk_tpu.utils import losses

    config = load_config(run_cfg)
    renderer = Renderer(run_cfg.parent / "ckpts", model_config=config.model,
                        background=EVAL_BACKGROUND)
    dm = FullImageDatamanager(config.dataparser, seed=config.seed)
    frames = dm.eval_frames
    psnr1, ssim1, _, preds = batched_eval(
        renderer, frames, None, return_preds=True
    )
    gtS = np.load(gts_path)["gts"]
    assert gtS.shape[0] == len(frames), (gtS.shape, len(frames))

    print(f"{'eval':>4s} {'ring':>4s} {'vs1spp':>7s} {'vsSS':>7s} "
          f"{'ssimSS':>7s}")
    rows = []
    for i, (p1, pred) in enumerate(zip(psnr1, preds)):
        ring = (i * 8) % 3
        mse = float(np.mean((pred - gtS[i]) ** 2))
        pS = -10 * np.log10(max(mse, 1e-10))
        sS = float(losses.ssim(jnp.asarray(gtS[i]), jnp.asarray(pred)))
        rows.append((ring, float(p1), pS, sS))
        print(f"{i:4d} {ring:4d} {float(p1):7.2f} {pS:7.2f} {sS:7.4f}")
    arr = np.array(rows)
    for ring in (0, 1, 2):
        m = arr[:, 0] == ring
        print(f"ring {ring}: vs1spp {arr[m,1].mean():6.2f}  "
              f"vsSS {arr[m,2].mean():6.2f}  ssimSS {arr[m,3].mean():.4f}")
    print(f"all: vs1spp {arr[:,1].mean():6.2f}  vsSS {arr[:,2].mean():6.2f}  "
          f"ssimSS {arr[:,3].mean():.4f}")
    out = {
        "per_image": {"psnr_vs_1spp": arr[:, 1].tolist(),
                      "psnr_vs_ss": arr[:, 2].tolist(),
                      "ssim_vs_ss": arr[:, 3].tolist()},
        "mean_psnr_vs_1spp": float(arr[:, 1].mean()),
        "mean_psnr_vs_ss": float(arr[:, 2].mean()),
        "mean_ssim_vs_ss": float(arr[:, 3].mean()),
    }
    Path("/root/runs/eval_vs_ss.json").write_text(json.dumps(out, indent=1))
    print("wrote /root/runs/eval_vs_ss.json")


if __name__ == "__main__":
    main()
