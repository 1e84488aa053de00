"""Generate a SIDD-scale dataset in the REAL on-disk format (VERDICT r3 item 3).

No real SIDD is reachable from this environment (zero egress — see
experiments/ref_parity/README.md), so this writes the closest achievable
proxy at the reference's actual scale and layout:

- all 56 train + 22 test scene instances (the hardcoded split ids,
  ref:sidd/sidd_utils.py:888-894), TWO image tuples each, indexed 010/011
  (the reference's default window start_tr_im_idx=10..end=12 and the real
  SIDD_Medium numbering — also what the DnCNN loader globs,
  ref:sidd/data_loader.py:178 '*GT_RAW_010.MAT'),
- REAL image dims: 5328x3000 Bayer (SIDD S6 raw full-frame; packed
  2664x1500x4, tiled at n_patches_per_image=2898 exactly like
  ref:job_noise_flow.sh:37),
- genuine .MAT files: v7.3/HDF5 images + v5 metadata struct with the NLF at
  UnknownTags[7,0][2][0][0:2] (data/mat_fixtures.py),
- (cam, ISO, NLF) cells assigned round-robin from the reference's
  cam_iso_nlf.txt 15-row table, so conditioning sees every published cell
  and noise is heteroscedastic per the matching camera NLF.

The production run over it (jobs/job_noise_flow.sh 'prod' config) then
exercises the FULL input path end to end: .MAT decode -> npy cache
(data/cache.py) -> C++ native loader (native/patch_loader.cc) -> fused
one-shot Pallas train step at the reference batch via lax.scan dispatch.

~20 GB of .MAT + ~10 GB cache; writes under <repo>/data (gitignored).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, REPO)

from noise_flow_tpu.data.mat_fixtures import write_sidd_scene  # noqa: E402
from noise_flow_tpu.data.sidd import (  # noqa: E402
    TEST_INSTANCE_IDS,
    TRAIN_INSTANCE_IDS,
    load_cam_iso_nlf,
)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--root",
                   default=os.path.join(REPO, "data",
                                        "SIDD_Medium_Raw_synth", "Data"))
    p.add_argument("--height", type=int, default=3000)
    p.add_argument("--width", type=int, default=5328)
    p.add_argument("--n_train", type=int, default=len(TRAIN_INSTANCE_IDS))
    p.add_argument("--n_test", type=int, default=len(TEST_INSTANCE_IDS))
    p.add_argument("--skip_existing", action="store_true", default=True)
    a = p.parse_args(argv)

    table = sorted(load_cam_iso_nlf(
        os.path.join(REPO, "cam_iso_nlf.txt")).items())
    ids = (list(TRAIN_INSTANCE_IDS[:a.n_train])
           + list(TEST_INSTANCE_IDS[:a.n_test]))
    t0 = time.time()
    for k, inst in enumerate(ids):
        cam_iso, (b1, b2) = table[k % len(table)]
        cam_s, iso_s = cam_iso.split("_")
        iso = int(iso_s)
        marker = os.path.join(
            a.root, "%04d" % inst)  # any dir starting with the id
        import glob
        if a.skip_existing and glob.glob(marker + "*"):
            continue
        write_sidd_scene(a.root, inst, cam=cam_s, iso=iso, h=a.height,
                         w=a.width, beta1=b1, beta2=b2, seed=inst,
                         n_images=2, first_idx=10)
        if k % 10 == 0:
            print(f"{k + 1}/{len(ids)} scenes ({cam_iso})  "
                  f"t={time.time() - t0:.0f}s", flush=True)
    print(f"wrote {len(ids)} scene instances under {a.root} "
          f"in {time.time() - t0:.0f}s", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
