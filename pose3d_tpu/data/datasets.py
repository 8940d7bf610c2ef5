"""Dataset sample producers (host-side, fixed-shape numpy outputs).

Capability parity with /root/reference/auxiliary/dataset.py:
  * Pascal3D          (156-301)  — train/eval, MultiView/PointCloud/None,
                                   blur/crop/flip/rotation aug w/ label fixes,
                                   canonical-frame azimuth `mutation`.
  * Pascal3DContrast  (437-612)  — 3 correlated views per train sample
                                   (original / flipped / rotated +-15) with
                                   contrast-style aug; few-shot via the frame.
  * ShapeNet          (304-425)  — renders composited over SUN backgrounds.
  * Pix3D             (619-686)  — eval-only, label unit conversion upstream.
  * Linemod           (689-750)  — eval-only.
  * Pix3DContrast     (753-901)  — incl. pose-balanced batch remap.

Differences by design (TPU-first):
  * samples are dicts of numpy arrays in NHWC / channels-last point layout;
  * every sample carries `cat_id` so evaluation is ONE pass with per-category
    reduction instead of 20 dataset rebuilds per epoch (SURVEY.md §7);
  * point clouds are loaded through pose3d_tpu.data.ply with a process cache
    (the reference re-parses the same .ply per item per epoch);
  * randomness comes from an explicit np.random.Generator per call, so worker
    processes/threads can't correlate.
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np
from PIL import Image

from pose3d_tpu.data import annotations as anno
from pose3d_tpu.data import decode_cache
from pose3d_tpu.data import ply
from pose3d_tpu.data import transforms as T


def _load_rgb(path: str) -> Image.Image:
    return Image.open(path).convert("RGB")


def _sorted_listdir(memo: dict, path: str) -> list[str]:
    names = memo.get(path)
    if names is None:
        names = memo[path] = sorted(os.listdir(path))
    return names


def _finalize(im: Image.Image, rng, train: bool, contrast: bool,
              host_augment: bool = True) -> np.ndarray:
    """ToTensor + aug + normalize + PCA lighting as float32 HWC.

    host_augment=False emits RAW pixels as uint8 — the photometric augs +
    normalize then run on-device inside the train step
    (pose3d_tpu.ops.augment), sidestepping the GIL-bound numpy ops that cap
    host throughput (docs/PERF.md). The uint8 wire format matches
    to_float_array to 1 ULP (ops.augment.dewire) and cuts the dominant
    host->device transfer 4x (PERF.md round 4 sustained training)."""
    if not host_augment:
        return np.asarray(im, np.uint8)
    arr = T.to_float_array(im)
    if train:
        if contrast:
            if rng.random() < 0.8:
                arr = T.color_jitter(arr, rng)
            arr = T.random_grayscale(arr, rng, p=0.2)
        else:
            arr = T.color_jitter(arr, rng)
    arr = T.normalize_image(arr)
    if train:
        arr = T.pca_lighting(arr, rng)
    return arr.astype(np.float32)


class _PascalBase:
    """Shared plumbing: category ids, multiview/pointcloud shape loading."""

    def __init__(self, root_dir, frame, shape, shape_dir, view_num, tour,
                 point_num, input_dim, decode_cache_mb=0.0):
        self.root_dir = root_dir
        self.frame = frame
        self.shape = shape
        self.shape_dir = shape_dir
        self.view_num = view_num
        self.tour = tour
        self.point_num = point_num
        self.input_dim = input_dim
        # decode_cache_mb > 0: LRU-cache decoded images so epochs >= 2 skip
        # JPEG decode (exact — see data/decode_cache.py). MultiView renders
        # are the hottest keys: few hundred distinct files reused every epoch.
        self.cache = decode_cache.make(decode_cache_mb)
        self._names_memo: dict[str, list[str]] = {}
        self.category_names = sorted(np.unique(frame.cat).tolist()) if len(frame) else []
        self._cat_to_id = {c: i for i, c in enumerate(self.category_names)}

    def __len__(self):
        return len(self.frame)

    def _cat_id(self, cat) -> int:
        return self._cat_to_id.get(cat, -1)

    # ---- device-resident shape bank (ops/shape_bank.py) -------------------
    def _ensure_shape_index(self) -> dict:
        """Stable (cat, cad_index) -> bank row mapping over the frame's
        distinct CAD models (sorted, so train/eval rebuilds agree)."""
        if getattr(self, "_shape_index", None) is None:
            pairs = sorted({(str(c), int(i)) for c, i in
                            zip(self.frame.cat, self.frame.cad_index)})
            self._shape_index = {p: k for k, p in enumerate(pairs)}
        return self._shape_index

    def build_shape_bank(self) -> tuple[np.ndarray, np.ndarray]:
        """Load every distinct cloud ONCE -> ((S, V, 3) f32 zero-padded,
        (S,) i32 counts) for ops.shape_bank.ShapeBank.from_arrays. Parent
        process only — workers never need the bank."""
        if self.shape != "PointCloud":
            raise ValueError("shape bank requires shape='PointCloud'")
        index = self._ensure_shape_index()
        clouds = []
        for cat, cad in index:  # insertion order == sorted == bank rows
            path = os.path.join(self.root_dir, self.shape_dir, cat,
                                "%02d" % cad, "compressed.ply")
            clouds.append(np.asarray(ply.load_vertices(path), np.float32))
        v = max(c.shape[0] for c in clouds)
        verts = np.zeros((len(clouds), v, 3), np.float32)
        counts = np.zeros((len(clouds),), np.int32)
        for k, c in enumerate(clouds):
            verts[k, : c.shape[0]] = c
            counts[k] = c.shape[0]
        return verts, counts

    def build_render_bank(self) -> tuple[np.ndarray, np.ndarray]:
        """Decode every distinct render set ONCE -> ((S, R, H, W, 3) u8,
        (72, K) i32 id_table) for ops.shape_bank.RenderBank.from_arrays.
        Renders are stored at input_dim resolution (the same host BILINEAR
        resize _load_shape applies), u8 — dewire on device reproduces
        to_float_array to 1 ULP. Refuses absurd budgets loudly."""
        if self.shape != "MultiView":
            raise ValueError("render bank requires shape='MultiView'")
        index = self._ensure_shape_index()
        stacks = []
        for cat, cad in index:
            render_dir = os.path.join(self.root_dir, self.shape_dir, cat,
                                      "%02d" % cad, "crop")
            names = _sorted_listdir(self._names_memo, render_dir)
            ims = []
            for name in names:
                im = _load_rgb(os.path.join(render_dir, name))
                if self.input_dim != 224:
                    im = im.resize((self.input_dim, self.input_dim),
                                   Image.BILINEAR)
                ims.append(np.asarray(im, np.uint8))
            stacks.append(np.stack(ims))
        r = {s.shape[0] for s in stacks}
        if len(r) != 1:
            raise ValueError(f"render sets differ in size across models: {r}")
        renders = np.stack(stacks)
        if renders.nbytes > 8 << 30:
            raise SystemExit(
                f"render bank would need {renders.nbytes / (1 << 30):.1f} GiB "
                "HBM — too large for --device_shapes; drop the flag (host "
                "render path) or reduce the model set")
        id_table = np.stack([T.multiview_ids(self.view_num, self.tour, m)
                             for m in range(72)]).astype(np.int32)
        return renders, id_table

    def _emit_shape(self, sample: dict, cat, cad_index, mutation, rng) -> None:
        """Attach the sample's shape: the cloud itself (host path) or the
        3-scalar bank reference (device_shapes=True)."""
        if getattr(self, "device_shapes", False):
            sample.update(self._shape_ref(cat, cad_index, mutation, rng))
        else:
            sample["shape"] = self._load_shape(cat, cad_index, mutation, rng)

    def _shape_ref(self, cat, cad_index, mutation, rng) -> dict[str, Any]:
        """The scalar stand-in for a cloud/render stack when
        device_shapes=True. PointCloud: bank row + z-rotation + the sample's
        PRNG seed (one host u32 draw replaces the host path's rng.choice
        draw). MultiView: bank row + the mutation (view selection is the
        deterministic id-table lookup — ops/shape_bank.RenderBank)."""
        row = self._ensure_shape_index()[(str(cat), int(cad_index))]
        if self.shape == "MultiView":
            return {"shape_id": np.int32(row),
                    "shape_mut": np.int32(mutation)}
        if self.shape != "PointCloud":
            raise ValueError("device_shapes requires PointCloud or MultiView")
        return {"shape_id": np.int32(row),
                "shape_rot": np.float32(mutation),
                "shape_seed": rng.integers(0, 2**32, dtype=np.uint32)}

    def _load_shape(self, cat, cad_index, mutation, rng) -> np.ndarray:
        if self.shape == "PointCloud":
            path = os.path.join(self.root_dir, self.shape_dir, str(cat),
                                "%02d" % int(cad_index), "compressed.ply")
            verts = ply.load_vertices(path)
            return T.sample_pointcloud(verts, self.point_num, mutation, rng)
        if self.shape == "MultiView":
            render_dir = os.path.join(self.root_dir, self.shape_dir, str(cat),
                                      "%02d" % int(cad_index), "crop")
            names = _sorted_listdir(self._names_memo, render_dir)
            ids = T.multiview_ids(self.view_num, self.tour, mutation)
            renders = []
            for i in ids:
                im = self.cache.open_rgb(os.path.join(render_dir, names[i]))
                if self.input_dim != 224:
                    im = im.resize((self.input_dim, self.input_dim), Image.BILINEAR)
                renders.append(T.to_float_array(im))
            return np.stack(renders).astype(np.float32)
        raise ValueError(self.shape)


class Pascal3D(_PascalBase):
    """Reference Pascal3D (dataset.py:156-301). Serves ObjectNet3D too."""

    def __init__(self, root_dir, annotation_file, input_dim=224, shape="MultiView",
                 shape_dir="Renders_semi_sphere", random=False, novel=True,
                 keypoint=True, train=True, cat_choice=None, random_model=False,
                 view_num=12, tour=2, random_range=0, point_num=2500, seed=None,
                 decode_cache_mb=0.0, device_shapes=False):
        frame = anno.pascal3d_frame(
            root_dir, annotation_file, train=train, keypoint=keypoint,
            novel=novel, cat_choice=cat_choice, seed=seed,
        )
        super().__init__(root_dir, frame, None if shape in (None, "None") else shape,
                         shape_dir, view_num, tour, point_num, input_dim,
                         decode_cache_mb=decode_cache_mb)
        self.train = train
        self.random = random
        self.random_range = random_range
        self.random_model = random_model
        # device_shapes: emit (shape_id, shape_rot, shape_seed) instead of the
        # sampled cloud; the train step resolves them against a device-resident
        # ShapeBank (ops/shape_bank.py). PointCloud only.
        self.device_shapes = device_shapes

    def get(self, idx: int, rng: np.random.Generator) -> dict[str, Any]:
        row = self.frame.iloc[idx]
        cat, cad_index = row["cat"], row["cad_index"]
        if self.random_model:
            df_cat = self.frame[(self.frame.cat == cat) & (self.frame.cad_index != cad_index)]
            if len(df_cat):
                cad_index = df_cat.iloc[rng.integers(len(df_cat))]["cad_index"]
        left, upper, right, lower = (row["left"], row["upper"], row["right"], row["lower"])
        label = row[anno.LABEL_COLS].to_numpy(dtype=np.float64)

        im = self.cache.open_rgb(os.path.join(self.root_dir, row["im_path"]))
        if self.train:
            if min(right - left, lower - upper) > 224 and rng.random() < 0.3:
                im = T.gaussian_blur(im, 3)
            im = T.random_crop(im, left, upper, right - left, lower - upper, rng)
            if rng.random() > 0.5:
                im = im.transpose(Image.FLIP_LEFT_RIGHT)
                label = T.flip_label(label)
            if rng.random() > 0.5:
                r = max(-60, min(60, rng.standard_normal() * 30))
                im = im.rotate(r)
                label = T.rotate_label(label, r)
            im = T.resize_pad(im, self.input_dim)
            arr = _finalize(im, rng, train=True, contrast=False)
        else:
            im = im.crop((left, upper, right, lower))
            im = T.resize_pad(im, self.input_dim)
            arr = _finalize(im, rng, train=False, contrast=False)

        label = T.process_viewpoint_label(label)
        sample = {"im": arr, "label": label.astype(np.int32),
                  "cat_id": np.int32(self._cat_id(cat))}
        if self.shape is None:
            return sample

        # canonical-frame azimuth randomization (dataset.py:282-287)
        if self.random and cat not in anno.BAD_CATS:
            if self.random_range == 0:
                mutation = int(rng.integers(-8, 9)) % 72
            elif self.random_range == 1:
                mutation = int(rng.integers(-17, 18)) % 72
            else:
                mutation = int(rng.integers(0, 72))
            sample["label"] = sample["label"].copy()
            sample["label"][0] = (sample["label"][0] - mutation * 5) % 360
        else:
            mutation = 0
        self._emit_shape(sample, cat, cad_index, mutation, rng)
        return sample


class Pascal3DContrast(_PascalBase):
    """Reference Pascal3DContrast (dataset.py:437-612): emits three
    correlated views per train sample."""

    def __init__(self, root_dir, annotation_file, input_dim=224, shape="MultiView",
                 shape_dir="Renders_semi_sphere", random=False, novel=False,
                 keypoint=True, train=True, cat_choice=None, random_model=False,
                 view_num=12, tour=2, random_range=0, point_num=2500, shot=None,
                 offset=0, train_cls=None, seed=None, host_augment=True,
                 device_views=False, decode_cache_mb=0.0, device_shapes=False):
        frame = anno.pascal3d_frame(
            root_dir, annotation_file, train=train, keypoint=keypoint, novel=novel,
            cat_choice=cat_choice, train_cls=train_cls, shot=shot,
            contrast_val_keypoint=not train, seed=seed,
        )
        super().__init__(root_dir, frame, None if shape in (None, "None") else shape,
                         shape_dir, view_num, tour, point_num, input_dim,
                         decode_cache_mb=decode_cache_mb)
        self.train = train
        self.offset = offset
        self.random_model = random_model
        # False -> raw [0,1] pixels; photometric augs run on-device (ops/augment)
        self.host_augment = host_augment
        # device_views: emit ONE raw decoded view + rot_sign; the flip and
        # +-15 deg rotated views are synthesized inside the jit step
        # (ops/augment.synthesize_views) — the host does decode/crop/
        # resize_pad once instead of three times (VERDICT r2 #4). Label
        # algebra stays host-side and exact. Implies device photometrics
        # (host_augment is ignored: raw pixels are emitted).
        # Flip-view caveat vs the host path: the device flip mirrors the
        # letterboxed canvas, the host flips the crop THEN letterboxes —
        # identical when the padding splits evenly, else a 1-px translation.
        # The rotation happens on the canvas instead of the pre-resize crop
        # (rotation/scale commute; the canvas keeps strictly more corner
        # content) — deliberate TPU-first deviations, documented in
        # docs/DESIGN.md.
        self.device_views = device_views
        # see Pascal3D: 3-scalar bank reference instead of the sampled cloud
        self.device_shapes = device_shapes

    def get(self, idx: int, rng: np.random.Generator) -> dict[str, Any]:
        row = self.frame.iloc[idx]
        cat, cad_index = row["cat"], row["cad_index"]
        if self.random_model:
            df_cat = self.frame[(self.frame.cat == cat) & (self.frame.cad_index != cad_index)]
            if len(df_cat):
                cad_index = df_cat.iloc[rng.integers(len(df_cat))]["cad_index"]
        left, upper, right, lower = (row["left"], row["upper"], row["right"], row["lower"])
        label = row[anno.LABEL_COLS].to_numpy(dtype=np.float64)

        im = self.cache.open_rgb(os.path.join(self.root_dir, row["im_path"]))
        cat_id = np.int32(self._cat_id(cat))

        if self.train:
            if min(right - left, lower - upper) > 224 and rng.random() > 0.5:
                im = T.gaussian_blur(im, int(rng.integers(1, 5)))
            im = T.random_crop(im, left, upper, right - left, lower - upper, rng)

            r = float(rng.choice([-15, 15]))

            if self.device_views:
                # one view out; flip/rot synthesized on-device. Same rng draw
                # order as the 3-view path up to here, so the crop/r stream
                # is identical for equivalence tests.
                arr = _finalize(T.resize_pad(im, self.input_dim), rng,
                                train=True, contrast=True, host_augment=False)
                sample = {
                    "im": arr,
                    "label": T.process_viewpoint_label(label, self.offset).astype(np.int32),
                    "label_flip": T.process_viewpoint_label(
                        T.flip_label(label), self.offset).astype(np.int32),
                    "label_rot": T.process_viewpoint_label(
                        T.rotate_label(label, r), self.offset).astype(np.int32),
                    "rot_sign": np.float32(np.sign(r)),
                    "cat_id": cat_id,
                }
                if self.shape is not None:
                    self._emit_shape(sample, cat, cad_index, 0, rng)
                return sample

            # rotated view (dataset.py:556-564)
            im_rot = T.resize_pad(im.rotate(r), self.input_dim)
            arr_rot = _finalize(im_rot, rng, train=True, contrast=True,
                                host_augment=self.host_augment)
            label_rot = T.process_viewpoint_label(T.rotate_label(label, r), self.offset)

            # flipped view (dataset.py:567-573)
            im_flip = T.resize_pad(im.transpose(Image.FLIP_LEFT_RIGHT), self.input_dim)
            arr_flip = _finalize(im_flip, rng, train=True, contrast=True,
                                 host_augment=self.host_augment)
            label_flip = T.process_viewpoint_label(T.flip_label(label), self.offset)

            arr = _finalize(T.resize_pad(im, self.input_dim), rng, train=True,
                            contrast=True, host_augment=self.host_augment)
            label_c = T.process_viewpoint_label(label, self.offset)

            sample = {
                "im": arr, "label": label_c.astype(np.int32),
                "im_flip": arr_flip, "label_flip": label_flip.astype(np.int32),
                "im_rot": arr_rot, "label_rot": label_rot.astype(np.int32),
                "cat_id": cat_id,
            }
            if self.shape is not None:
                self._emit_shape(sample, cat, cad_index, 0, rng)
            return sample

        # eval path (dataset.py:578-612)
        im = im.crop((left, upper, right, lower))
        arr = _finalize(T.resize_pad(im, self.input_dim), rng, train=False,
                        contrast=True)
        label_c = T.process_viewpoint_label(label, self.offset)
        sample = {"im": arr, "label": label_c.astype(np.int32), "cat_id": cat_id}
        # reference defect fixed (not replicated): dataset.py:602-603 returns
        # only (im, label) for MultiView val, but evaluation.val(shape=
        # 'MultiView') unpacks 3 items (evaluation.py:23-24) — the reference
        # MV-teacher eval path crashes. We emit the renders at val for every
        # non-None shape so teacher evaluation works for both encoders.
        if self.shape is not None:
            self._emit_shape(sample, cat, cad_index, 0, rng)
        return sample


class ShapeNet(_PascalBase):
    """Synthetic renders over random SUN backgrounds (dataset.py:304-425)."""

    def __init__(self, root_dir, annotation_file, bg_dir, bg_list="SUN_database.txt",
                 input_dim=224, model_number=200, novel=False, shape="MultiView",
                 decode_cache_mb=0.0,
                 shape_dir="Renders_semi_sphere", view_num=12, tour=2,
                 random_range=0, point_num=2500, cat_choice=None, train=True,
                 random=False):
        import pandas as pd

        frame = anno.shapenet_frame(root_dir, annotation_file, train=train,
                                    novel=novel, cat_choice=cat_choice,
                                    model_number=model_number)
        frame = frame.rename(columns={"cat_id": "cat"})
        super().__init__(root_dir, frame, None if shape in (None, "None") else shape,
                         shape_dir, view_num, tour, point_num, input_dim,
                         decode_cache_mb=decode_cache_mb)
        self.bg_dir = bg_dir
        self.bg_list = pd.read_csv(os.path.join(bg_dir, bg_list))
        self.train = train
        self.random = random
        self.random_range = random_range

    def get(self, idx: int, rng: np.random.Generator) -> dict[str, Any]:
        row = self.frame.iloc[idx]
        cat, example_id = row["cat"], row["example_id"]
        label = np.array([row["azimuth"], row["elevation"], 0.0], np.float64)

        im_render = self.cache.open_raw(os.path.join(self.root_dir, row["image_path"]))
        r = max(-45, min(45, rng.standard_normal() * 15))
        im_render = im_render.rotate(r)
        label[2] += r

        # composite over a random background (dataset.py:377-382)
        bg_path = os.path.join(self.bg_dir,
                               self.bg_list.iloc[int(rng.integers(len(self.bg_list))), 1])
        try:
            bg = self.cache.open_rgb(bg_path)
            if bg.size != im_render.size:
                raise OSError
        except OSError:
            bg = Image.new("RGB", im_render.size, (255, 255, 255))
        composite = bg.copy()
        mask = im_render if im_render.mode == "RGBA" else None
        composite.paste(im_render, (0, 0), mask)
        im = composite

        if self.train:
            if rng.random() < 0.3:
                im = T.gaussian_blur(im, 3)
            if rng.random() > 0.5:
                im = im.transpose(Image.FLIP_LEFT_RIGHT)
                label[0] = (360 - label[0]) % 360
                label[2] = -label[2]
            # ColorJitter + RandomCrop(224)
            arr = T.to_float_array(im)
            arr = T.color_jitter(arr, rng)
            arr = _center_or_random_crop(arr, 224, rng, random_crop=True)
            arr = T.normalize_image(arr)
            arr = T.pca_lighting(arr, rng)
        else:
            arr = T.to_float_array(im)
            arr = _center_or_random_crop(arr, 224, rng, random_crop=False)
            arr = T.normalize_image(arr)

        label[1] += 90.0
        label[2] += 180.0
        label = label.astype(np.int64)

        sample = {"im": arr.astype(np.float32), "label": label.astype(np.int32),
                  "cat_id": np.int32(self._cat_id(cat))}
        if self.shape is None:
            return sample
        if self.random:
            if self.random_range == 0:
                mutation = int(rng.integers(-8, 9)) % 72
            elif self.random_range == 1:
                mutation = int(rng.integers(-17, 18)) % 72
            else:
                mutation = int(rng.integers(0, 72))
            sample["label"][0] = (sample["label"][0] - mutation * 5) % 360
        else:
            mutation = 0
        render_dir = os.path.join(self.root_dir, self.shape_dir, "%08d" % int(cat),
                                  str(example_id), "crop")
        names = _sorted_listdir(self._names_memo, render_dir)
        ids = T.multiview_ids(self.view_num, self.tour, mutation)
        renders = [T.to_float_array(self.cache.open_rgb(os.path.join(render_dir, names[i])))
                   for i in ids]
        sample["shape"] = np.stack(renders).astype(np.float32)
        return sample


def _center_or_random_crop(arr, size, rng, random_crop):
    h, w = arr.shape[:2]
    if h < size or w < size:
        pad_h, pad_w = max(0, size - h), max(0, size - w)
        arr = np.pad(arr, ((pad_h // 2, pad_h - pad_h // 2),
                           (pad_w // 2, pad_w - pad_w // 2), (0, 0)))
        h, w = arr.shape[:2]
    if random_crop:
        top = int(rng.integers(0, h - size + 1))
        left = int(rng.integers(0, w - size + 1))
    else:
        top, left = (h - size) // 2, (w - size) // 2
    return arr[top:top + size, left:left + size]


class Pix3D:
    """Eval-only Pix3D loader (dataset.py:619-686)."""

    def __init__(self, root_dir, annotation_file, input_dim=224, shape="MultiView",
                 cat_choice=None, random_model=False,
                 shape_dir="Renders_semi_sphere", view_num=12, tour=2,
                 decode_cache_mb=0.0):
        self.root_dir = root_dir
        self.cache = decode_cache.make(decode_cache_mb)
        self.frame = anno.pix3d_frame(root_dir, annotation_file, cat_choice)
        self.shape = None if shape in (None, "None") else shape
        self.shape_dir = shape_dir
        self.view_num = view_num
        self.tour = tour
        self.input_dim = input_dim
        self.random_model = random_model
        self.category_names = sorted(np.unique(self.frame.cat_id).tolist()) if len(self.frame) else []
        self._cat_to_id = {c: i for i, c in enumerate(self.category_names)}

    def __len__(self):
        return len(self.frame)

    def get(self, idx: int, rng: np.random.Generator) -> dict[str, Any]:
        row = self.frame.iloc[idx]
        label = row[anno.LABEL_COLS].to_numpy(dtype=np.float64).astype(np.int64)
        im = self.cache.open_rgb(os.path.join(self.root_dir, row["image_path"]))
        if self.input_dim != 224 or im.size != (self.input_dim, self.input_dim):
            im = im.resize((self.input_dim, self.input_dim), Image.BILINEAR)
        arr = T.normalize_image(T.to_float_array(im))
        return {"im": arr.astype(np.float32), "label": label.astype(np.int32),
                "cat_id": np.int32(self._cat_to_id.get(row["cat_id"], -1))}


class Linemod:
    """Eval-only LineMod loader (dataset.py:689-750)."""

    def __init__(self, root_dir, annotation_file, input_dim=224, shape="MultiView",
                 cat_choice=None, shape_dir="Renders_semi_sphere", view_num=12, tour=2,
                 decode_cache_mb=0.0):
        self.root_dir = root_dir
        self.cache = decode_cache.make(decode_cache_mb)
        self.frame = anno.linemod_frame(root_dir, annotation_file, cat_choice)
        self.shape = None if shape in (None, "None") else shape
        self.input_dim = input_dim
        self.category_names = sorted(np.unique(self.frame.obj_id).tolist()) if len(self.frame) else []
        self._cat_to_id = {c: i for i, c in enumerate(self.category_names)}

    def __len__(self):
        return len(self.frame)

    def get(self, idx: int, rng: np.random.Generator) -> dict[str, Any]:
        row = self.frame.iloc[idx]
        x, y, w, h = row["x"], row["y"], row["w"], row["h"]
        label = row[anno.LABEL_COLS].to_numpy(dtype=np.float64)
        im = self.cache.open_rgb(os.path.join(self.root_dir, row["image_path"]))
        im = im.crop((x, y, x + w, y + h))
        im = T.resize_pad(im, self.input_dim)
        arr = T.normalize_image(T.to_float_array(im))
        # LineMod label units (dataset.py:735-737): ele += 90, inp = (-inp+180)%360
        label[1] = label[1] + 90.0
        label[2] = (-label[2] + 180.0) % 360.0
        return {"im": arr.astype(np.float32),
                "label": label.astype(np.int64).astype(np.int32),
                "cat_id": np.int32(self._cat_to_id.get(row["obj_id"], -1))}


class Pix3DContrast:
    """Pix3DContrast (dataset.py:753-901) incl. the pose-balanced batch remap."""

    def __init__(self, root_dir, annotation_file, train=True, input_dim=224,
                 offset=0, shot=None, train_feat=False, cls_choice=None,
                 idx_choice=None, rot=0, train_cls=None, pose_batch=False,
                 bs=32, seed=None, decode_cache_mb=0.0):
        self.root_dir = root_dir
        self.cache = decode_cache.make(decode_cache_mb)
        self.input_dim = input_dim
        self.train = train
        self.offset = offset
        self.rot = rot
        self.frame = anno.pix3d_contrast_frame(
            root_dir, annotation_file, train=train, train_feat=train_feat,
            cls_choice=cls_choice, train_cls=train_cls, shot=shot,
            idx_choice=idx_choice, seed=seed,
        )
        self.category_names = sorted(np.unique(self.frame.cls_name).tolist()) if len(self.frame) else []
        self._cat_to_id = {c: i for i, c in enumerate(self.category_names)}
        self.pose_batch = pose_batch
        self.bs = bs
        if pose_batch:
            self.pose_index = {i: [] for i in range(12)}
            for i in range(len(self.frame)):
                pose_cls = int(self.frame.iloc[i]["azimuth"] // 30)
                self.pose_index[pose_cls].append(i)

    def __len__(self):
        return len(self.frame)

    def _remap(self, idx: int) -> int:
        """Pose-balanced index remap (dataset.py:829-833)."""
        batch_index = idx // self.bs
        cls_index = batch_index % 12
        bucket = self.pose_index[cls_index]
        if not bucket:
            return idx % len(self.frame)
        sample_index = (self.bs * idx // (12 * self.bs) + idx % self.bs) % len(bucket)
        return bucket[sample_index]

    def get(self, idx: int, rng: np.random.Generator) -> dict[str, Any]:
        if self.pose_batch:
            idx = self._remap(idx)
        row = self.frame.iloc[idx]
        cls_name = row["cls_name"]
        left, upper, right, lower = row["left"], row["upper"], row["right"], row["lower"]
        label = row[anno.LABEL_COLS].to_numpy(dtype=np.float64)
        im = self.cache.open_rgb(os.path.join(self.root_dir, row["im_path"]))
        cat_id = np.int32(self._cat_to_id.get(cls_name, -1))

        if self.train:
            im_pos = im.copy()
            if min(right - left, lower - upper) > 224 and rng.random() > 0.5:
                im = T.gaussian_blur(im, int(rng.integers(1, 5)))
            im = T.random_crop(im, left, upper, right - left, lower - upper, rng)
            im_pos = T.random_crop(im_pos, left, upper, right - left, lower - upper, rng)
            arr_pos = _finalize(T.resize_pad(im_pos, self.input_dim), rng, True, True)

            r = float(rng.choice([-self.rot, self.rot]))
            arr_rot = _finalize(T.resize_pad(im.rotate(r), self.input_dim), rng, True, True)
            label_rot = T.process_viewpoint_label(T.rotate_label(label, r), self.offset)

            arr_flip = _finalize(
                T.resize_pad(im.transpose(Image.FLIP_LEFT_RIGHT), self.input_dim),
                rng, True, True)
            label_flip = T.process_viewpoint_label(T.flip_label(label), self.offset)

            arr = _finalize(T.resize_pad(im, self.input_dim), rng, True, True)
            label_c = T.process_viewpoint_label(label, self.offset)
            return {
                "cls_index": cat_id, "im": arr, "label": label_c.astype(np.int32),
                "im_flip": arr_flip, "label_flip": label_flip.astype(np.int32),
                "im_rot": arr_rot, "label_rot": label_rot.astype(np.int32),
                "im_pos": arr_pos, "cat_id": cat_id,
            }

        im = im.crop((left, upper, right, lower))
        arr = _finalize(T.resize_pad(im, self.input_dim), rng, False, True)
        label_c = T.process_viewpoint_label(label, self.offset)
        return {"im": arr, "label": label_c.astype(np.int32), "cat_id": cat_id}
