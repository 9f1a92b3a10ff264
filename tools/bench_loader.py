"""Host data-pipeline throughput (no TPU needed): images/s through
DatasetMapper + CopyPasteMapper + TrainLoader batching on synthetic data.

The orchestrator's north star ("the TPU never stalls") requires
loader rate >= train-step rate (Swin-L 896 b2 @ ~300 ms/step = ~6.7
imgs/s/host); this measures the host side alone.
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import os
    import tempfile

    import cv2

    from divergen_tpu.config import get_cfg
    from divergen_tpu.data.copy_paste_mapper import CopyPasteMapper
    from divergen_tpu.data.dataset_mapper import DatasetMapper
    from divergen_tpu.data.loader import TrainLoader
    from divergen_tpu.data.samplers import TrainingSampler

    tmp = tempfile.mkdtemp()
    rng = np.random.RandomState(0)
    records = []
    for i in range(32):
        img = rng.randint(0, 255, (640, 800, 3), np.uint8)
        path = os.path.join(tmp, f"{i}.jpg")
        cv2.imwrite(path, img)
        anns = []
        for _ in range(8):
            x, y = rng.randint(0, 600), rng.randint(0, 440)
            w, h = rng.randint(30, 180), rng.randint(30, 180)
            anns.append({
                "bbox": [x, y, w, h],
                "category_id": int(rng.randint(0, 20)),
                "segmentation": [[x, y, x + w, y, x + w, y + h, x, y + h]],
            })
        records.append({"file_name": path, "image_id": i, "height": 640,
                        "width": 800, "annotations": anns})

    cfg = get_cfg()
    cfg.INPUT.TRAIN_SIZE = 896
    cfg.INPUT.USE_COPY_PASTE = True
    cfg.INPUT.INST_POOL = False
    cfg.INPUT.COPY_METHOD = "self_copy"
    mapper = CopyPasteMapper(DatasetMapper(cfg, True), cfg)
    mapper.set_dataset(records)

    # single-thread mapper rate
    g = np.random.default_rng(0)
    t0 = time.perf_counter()
    n = 48
    for i in range(n):
        mapper(records[i % len(records)], g)
    t_map = (time.perf_counter() - t0) / n
    print(f"mapper: {t_map * 1e3:.1f} ms/img ({1 / t_map:.1f} imgs/s single-thread)")

    # full loader (threads + batching)
    loader = TrainLoader(records, mapper, TrainingSampler(len(records)),
                         batch_size=8, num_workers=4)
    it = iter(loader)
    next(it)  # warmup
    t0 = time.perf_counter()
    nb = 8
    for _ in range(nb):
        next(it)
    dt = (time.perf_counter() - t0) / nb
    print(f"loader: {dt * 1e3:.1f} ms/batch(8) = {8 / dt:.1f} imgs/s "
          f"(train step budget: Swin-L 896 b2 ~300 ms -> needs ~6.7 imgs/s/host)")
    loader.stop() if hasattr(loader, "stop") else None
    time.sleep(0.2)


if __name__ == "__main__":
    main()
