"""Global config defaults.

Mirrors the reference default tree (``lib/config/config.py:34-425``) key-for-key
so that the reference's experiment YAMLs and ``run.py -t ... k v`` CLI overrides
parse unchanged.  TPU-specific knobs are added at the bottom under their own
names (``tpu_*``) and never collide with reference keys.
"""
from __future__ import annotations

from enum import Enum, auto

from relightableavatar_tpu.config.node import CN


class Output(Enum):
    # visualization keys and configurations (reference config.py:364-382)
    Semantic = auto()
    Feature = auto()
    Surface = auto()
    Residual = auto()
    Depth = auto()
    Alpha = auto()
    Normal = auto()
    Specular = auto()
    Albedo = auto()
    Roughness = auto()
    Shading = auto()
    Rendering = auto()
    Envmap = auto()


def default_cfg() -> CN:
    cfg = CN()
    cfg.check_bound_sdf = False
    cfg.check_termination_sdf = False
    cfg.bruteforce_st = False
    cfg.smpl_distance = False
    cfg.H = -1
    cfg.W = -1
    cfg.normalize_shading = False
    cfg.normalize_specular = True
    cfg.vis_lvis_map = False
    cfg.vis_ldot_map = False
    cfg.ground_shading_multiplier = 1.0
    cfg.min_clip = 1.0
    cfg.novel_view_ixt_ratio = 1.0
    cfg.lambert_only = False
    cfg.glossy_only = False
    cfg.light_xyz_noise_std = 1.0
    cfg.shadow_dist_th = 0.05
    cfg.use_geometry = False

    cfg.ablate_hdq = False
    cfg.ablate_hdq_mode = 'hdq'  # world, can, curve, hdq
    cfg.shade_max = 4.0
    cfg.fix_material = -1

    cfg.relighting = False
    cfg.no_claybook = False
    cfg.no_visibility = False
    cfg.light_multiplier = 1.0

    cfg.dilation_bias = 0.0025
    cfg.dilation_multiplier = 0.5
    cfg.randperm_pass = 2
    cfg.clip_grad_norm = 40.0
    cfg.clip_grad_value = 40.0
    cfg.no_data_cache = False

    cfg.surf_sample_range = 0.005  # in-out 5mm for 3 point volume rendering

    cfg.fps = 30
    cfg.clip_near = 0.02
    cfg.clip_far = 10.0
    cfg.box_far = 5.0
    cfg.lambertian = False
    cfg.achro_light = False
    cfg.envmap_upscale = 2
    cfg.find_unused_parameters = False

    cfg.geometry_mesh = ''
    cfg.geometry_pretrain = ''
    cfg.fresnel_f0 = 0.02
    cfg.xyz_noise_std = 0.02

    cfg.olats = [0, 27, 91, 149, 200, 288, 333, 398, 488,
                 2 * 32 + 0, 4 * 32 + 7,
                 4 * 32 + 13, 4 * 32 + 15, 4 * 32 + 17, 4 * 32 + 19,
                 4 * 32 + 21, 4 * 32 + 23, 4 * 32 + 25, 4 * 32 + 27,
                 2 * 32 + 13, 2 * 32 + 15, 2 * 32 + 17, 2 * 32 + 19,
                 2 * 32 + 21, 2 * 32 + 23, 2 * 32 + 25, 2 * 32 + 27]
    cfg.olat_inten = 100.0
    cfg.ambient_inten = 0.25

    cfg.lighting_dir = 'data/lighting'
    cfg.ground_normal = [0, 0, 1]
    cfg.ground_origin = [0, 0, 0]
    cfg.ground_albedo = [0.05, 0.05, 0.05]
    cfg.ground_roughness = 0.1

    cfg.env_image_h = 6144
    cfg.env_image_w = 8192
    cfg.env_h = 16
    cfg.env_w = 32
    cfg.env_r = 10

    # surface intersection sphere tracing (reference config.py:116-124)
    cfg.sphere_tracing = CN()
    cfg.sphere_tracing.iter = 16
    cfg.sphere_tracing.tan_i = 1000
    cfg.sphere_tracing.relax = 0.0
    cfg.sphere_tracing.offset = 0.02
    cfg.sphere_tracing.eps = 1e-8
    cfg.sphere_tracing.near_offset = 0.01
    cfg.sphere_tracing.shadow_skip_iter = 1
    cfg.sphere_tracing.tan_i_multiplier = 1

    # self shadow
    cfg.obj_lvis = CN()
    cfg.obj_lvis.iter = 4
    cfg.obj_lvis.offset = 0.01
    cfg.obj_lvis.relax = 0.0
    cfg.obj_lvis.near_offset = 0.02
    cfg.obj_lvis.dist_th = 0.05

    # cast shadow onto environment
    cfg.env_lvis = CN()
    cfg.env_lvis.iter = 16
    cfg.env_lvis.offset = 0.01
    cfg.env_lvis.relax = 0.0
    cfg.env_lvis.near_offset = 0.02
    cfg.env_lvis.bbox_margin = 0.25
    cfg.env_lvis.dist_th = 0.005

    cfg.xyz_res = 10
    cfg.view_res = 4
    # xyz/sdf point encoder: 'pe' | 'hash' (reference embedder.py:217-224
    # get_embedder — constructor-only and dormant there, config-selectable
    # here; see ops/hashgrid.py)
    cfg.e_type = 'pe'
    cfg.surf_reg_th = 0.02
    cfg.interpolate_path = False

    cfg.mesh = CN()
    cfg.mesh.meta = ''
    cfg.mesh.type = 'tpose'
    cfg.mesh.lambda_smooth = 9
    cfg.mesh.replace_tjoints = False

    cfg.print_network = True
    cfg.table_row_limit = 5

    cfg.profiling = CN()
    cfg.profiling.enabled = False
    cfg.profiling.clear_previous = True
    cfg.profiling.skip_first = 10
    cfg.profiling.wait = 5
    cfg.profiling.warmup = 5
    cfg.profiling.active = 10
    cfg.profiling.repeat = 5
    cfg.profiling.record_dir = ""

    cfg.detect_anomaly = False
    cfg.mesh_th_to_sdf = False

    cfg.blend_radius = 0.075
    cfg.sample_vert_cnt = 3

    cfg.fixed_lbs_pose = -1
    cfg.surface_blend_weight = False

    # Loss Configuration
    cfg.img_loss_weight = 1.0
    cfg.resd_loss_weight = 0.01
    cfg.resd_loss_weight_gamma = 1.0
    cfg.resd_loss_weight_milestone = 1
    cfg.dist_loss_weight = 0.01
    cfg.msk_loss_weight = 0.01
    cfg.norm_loss_weight = 0.001
    cfg.sem_loss_weight = 0.001
    cfg.eikonal_loss_weight = 0.025
    cfg.observed_eikonal_loss_weight = 0.050
    cfg.albedo_sparsity = 5.0e-4
    cfg.albedo_smooth_weight = 5.0e-3
    cfg.roughness_smooth_weight = 5.0e-3
    # silhouette supervision at the sphere-traced surface (no reference
    # counterpart: the reference supervises masks only through the soft-IoU
    # on the volume/edge acc, sphere_tracing_renderer.py:593-598 +
    # relight_trainer.py:113-118, which dilutes the thin-band gradient by
    # the union).  Per-ray BCE on sigmoid(-edge_sdf/silh_scale): the
    # sigmoid concentrates gradient exactly at the zero-crossing, where
    # the measured eval error lives (results/tubeman_e2eC/QUALITY_DIAGNOSIS.md:
    # 66.9% of MSE in a 5px silhouette band).  0.0 = off (default).
    cfg.silh_loss_weight = 0.0
    cfg.silh_scale = 0.005            # sdf normalization scale (m); ~surf_sample_range
    cfg.silh_mode = 'hinge'           # 'hinge' (deadband, at closest approach)
                                      # | 'bce' (run-G measured negative)
    cfg.silh_margin = 0.002           # outside-ray clearance target (m, hinge)

    cfg.eval_whole_img = True
    cfg.dry_run = False
    cfg.sdf_res = 6
    cfg.train_chunk_size = 4096
    cfg.render_chunk_size = 8192
    cfg.network_chunk_size = 4096 * 64
    cfg.bg_brightness = 0.0
    cfg.sdf_beta_init_value = 0.1
    cfg.feat_dim = 256
    cfg.resd_limit = 0.05
    cfg.cond_dim = -1
    cfg.occ_th = 0.5
    cfg.dist_th = 0.1
    cfg.surf_reg_sdf_th = 0.02
    cfg.sdf_finite_diff = 0

    cfg.collate = True
    cfg.load_others = True

    cfg.bkgd = 'bkgd'
    cfg.mask = 'mask'
    cfg.load_semantics = False         # SCHP semantic maps -> batch.sem (sem_utils)
    cfg.load_normal = False            # GT normal maps -> batch.norm (normal loss)

    cfg.pin_memory = True
    cfg.prefetch_factor = 10
    cfg.subpixel_sample = False
    cfg.n_bones = 24
    cfg.fixed_latent = -1
    cfg.smoothing_term = 10.0
    cfg.perform = False
    cfg.crop_min_size = 180
    cfg.crop_max_size = 200

    cfg.perturb = 1.
    cfg.n_samples = 64
    cfg.n_importance = 128
    cfg.n_rays = 1024
    cfg.ratio = 1.0

    cfg.mesh_simp_face = -1

    cfg.exp_name = 'default'
    cfg.distributed = False

    # data
    cfg.skip = []
    cfg.human = 313
    cfg.training_view = [0, 6, 12, 18]
    cfg.test_view = [0, 1, 2, 3]
    cfg.begin_ith_latent = 0
    cfg.begin_ith_frame = 0
    cfg.num_train_frame = 1
    cfg.num_eval_frame = -1
    cfg.num_render_frame = -1
    cfg.num_render_view = 300
    cfg.frame_interval = 1
    cfg.mask_bkgd = True
    cfg.body_sample_ratio = 0.5
    cfg.face_sample_ratio = 0.
    cfg.edge_sample_ratio = 0.        # silhouette-band focus sampling (no ref counterpart)
    cfg.edge_band_px = 5              # band half-machinery: dilate/erode kernel size
    cfg.use_geodesic_filter = True
    cfg.erode_dilate_mask = False

    cfg.mesh_th = 0.5
    cfg.voxel_size = [0.005, 0.005, 0.005]

    cfg.task = 'deform'

    cfg.gpus = list(range(8))
    cfg.resume = True

    cfg.ep_iter = -1
    cfg.save_ep = 200
    cfg.eval_ep = 100
    cfg.save_latest_ep = 1
    # mid-epoch checkpoint cadence in ITERATIONS (0 = off; ours — the
    # reference only saves at epoch boundaries).  Checkpoints carry full
    # training state (recorder/RNG/iter), so a mid-epoch resume is exact.
    cfg.save_latest_iter = 0

    # train
    cfg.train = CN()
    cfg.train.dataset = 'CocoTrain'
    cfg.train.epoch = 10000
    cfg.train.load_epoch = -1
    cfg.train.num_workers = 8
    cfg.train.batch_sampler = 'default'   # 'default' | 'image_size'
    cfg.train.sampler_meta = CN({'min_hw': [256, 256], 'max_hw': [480, 640],
                                 'strategy': 'range'})
    cfg.train.sampler = 'RandomSampler'
    cfg.train.collator = ''
    cfg.train.shuffle = True
    cfg.train.optim = 'adam'
    cfg.train.lr = 1e-4
    cfg.train.eps = 1e-8
    cfg.train.weight_decay = 0.
    cfg.train.lr_table = CN()
    cfg.train.eps_table = CN()
    cfg.train.weight_decay_table = CN()
    cfg.train.scheduler = CN({'type': 'multi_step',
                              'milestones': [80, 120, 200, 240],
                              'gamma': 0.5})
    cfg.train.batch_size = 4

    # test
    cfg.test = CN()
    cfg.test.dataset = 'CocoVal'
    cfg.test.batch_size = 1
    cfg.test.epoch = -1
    cfg.test.sampler = 'FrameSampler'
    cfg.test.batch_sampler = 'default'
    cfg.test.collator = ''
    cfg.test.frame_sampler_interval = 30
    cfg.test.view_sampler_interval = 3

    cfg.trained_model_dir = 'data/trained_model'
    cfg.record_dir = 'data/record'
    cfg.log_interval = 1
    cfg.record_interval = 5
    cfg.record_tb = True              # also emit events.out.tfevents.* (TensorBoard-readable)
    cfg.result_dir = 'data/result'

    cfg.tpose_geometry = 'bigpose'
    cfg.erode_dilate_edge = True

    # evaluation
    cfg.replace_light = ''
    cfg.test_light = ['gym_entrance']
    cfg.rotate_ratio = 4
    cfg.vis_ground_shading = False
    cfg.sdf_add_specular = False
    cfg.ground_attach_envmap = True
    cfg.probe_size_ratio = 0.2
    cfg.fix_random = False
    cfg.skip_eval = False
    cfg.test_novel_pose = False

    cfg.novel_view_center = []
    cfg.novel_view_z_off = -1

    for t in Output:
        cfg[f'vis_{t.name.lower()}_map'] = False

    cfg.vis_median_depth = False
    cfg.vis_rotate_light = False
    cfg.vis_sphere_tracing = False
    cfg.vis_novel_light = False
    cfg.vis_pose_sequence = False
    cfg.vis_novel_view = False
    cfg.vis_tpose_mesh = False
    cfg.vis_posed_mesh = False
    cfg.vis_can_mesh = False
    cfg.track_tpose_mesh = False
    cfg.shading_albedo = 0.8
    cfg.vis_ext = '.jpg'

    cfg.store_alpha_channel = True
    cfg.store_ground_truth = False
    cfg.store_image_error = False
    cfg.print_render_progress = False
    cfg.geometry_normal = False
    cfg.geometry_visibility = False
    cfg.local_visibility = False
    cfg.always_fix_material = True
    cfg.no_dfss = False
    cfg.albedo_slope = 1.0
    cfg.albedo_bias = 0.0
    cfg.roughness_slope = 0.90
    cfg.roughness_bias = 0.09
    cfg.relight_network_width = 128
    cfg.relight_network_depth = 2
    cfg.relight_xyz_res = 10
    cfg.relight_view_res = 4
    cfg.envmap_init_intensity = 0.2
    cfg.tonemapping_albedo = True
    cfg.tonemapping_rendering = True
    cfg.rgb_as_albedo = False
    cfg.zero_roughness = False
    cfg.ray_samples = 64
    cfg.vis_samples = 64
    cfg.extra_prefix = ''
    cfg.store_video_output = True
    cfg.only_visibility = False
    cfg.albedo_multiplier = 1.0

    cfg.norm_th = 0.1

    # dataset module dispatch strings (reference configs/base.yaml:5-12);
    # resolved through our registry, reference module names are aliases.
    cfg.train_dataset_module = 'lib.datasets.base_dataset'
    cfg.test_dataset_module = 'lib.datasets.base_dataset'
    cfg.network_module = 'lib.networks.deform.base_network'
    cfg.renderer_module = 'lib.networks.renderer.base_renderer'
    cfg.trainer_module = 'lib.train.trainers.base_trainer'
    cfg.evaluator_module = 'lib.evaluators.base_evaluator'
    cfg.visualizer_module = 'lib.visualizers.base_visualizer'

    cfg.train_dataset = CN({'data_root': '', 'human': '', 'ann_file': 'annots.npy', 'split': 'train'})
    cfg.test_dataset = CN({'data_root': '', 'human': '', 'ann_file': 'annots.npy', 'split': 'test'})
    cfg.train_motion = 'motion.npz'
    cfg.test_motion = 'motion.npz'
    cfg.body_model = 'body_model.npz'

    # ---------------------------------------------------------------- TPU knobs
    cfg.tpu = CN()
    cfg.tpu.mesh_shape = [-1]          # data/ray-parallel mesh; -1 = all devices
    cfg.tpu.axis_name = 'rays'
    cfg.tpu.bf16_mlp = True            # run MLP matmuls in bfloat16 on the MXU
    cfg.tpu.knn_impl = 'auto'          # 'auto' | 'pallas' | 'xla'
    cfg.tpu.shadow_grid = 0            # shadow-ray SDF voxel cache res (0 = exact HDQ)
    cfg.tpu.surf_grid_iters = 0        # camera-trace pre-march iterations on the
                                       # cache's conservative lower bound (never
                                       # crosses a true surface; tightens near)
    cfg.tpu.surf_exact_iters = 0       # exact trace iters after the pre-march
                                       # (0 = sphere_tracing.iter; reducing this
                                       # is the only lossy knob — quality-gate it)
    cfg.tpu.surf_miss_skip = False     # provably-exact camera-trace miss skip:
                                       # clean misses + ray-block padding never
                                       # enter the exact HDQ trace (needs
                                       # shadow_grid > 0 for the lower bound;
                                       # tracing.py sphere_trace_miss_skip)
    cfg.tpu.surf_skip_iters = 32       # lower-bound march iterations for the skip
    cfg.tpu.surf_skip_margin = 0.01    # skip-march safety margin m0 (meters);
                                       # m(t) = m0 + 2 t / tan_i keeps skipped
                                       # rays outside the DFSS AA band
    cfg.tpu.surf_skip_block = 1024     # exact-trace slice size after the sort
    cfg.tpu.lvis_sweep = False         # slice-sweep DFSS volume instead of shadow rays
    cfg.tpu.lvis_query_offset = 0.5    # sweep lookup offset along the normal (voxels)
    cfg.tpu.grid_margin = 0.05         # bbox pad for the SDF cache volume (occluders
                                       # are the body itself; the reference's 0.25
                                       # env_lvis margin only lengthens shadow rays)
    cfg.tpu.shadow_skip_resd = False   # shadow rays skip the residual MLP in the HDQ
    cfg.tpu.shadow_compact = 0.0       # fraction of shadow pts through MLPs (0 = all)
    cfg.tpu.shadow_verts_sub = 1       # >1: shadow KNN vs 1/4 vertex subsample
    cfg.tpu.grad_sample_budget = 131072  # max B*rays*samples per backward chunk (grad accumulation)
    cfg.tpu.lvis_downscale = 1         # trace light visibility at (eH/k, eW/k), upsample
    cfg.tpu.bf16_act = False           # keep hidden MLP activations in bfloat16
    cfg.tpu.distant_envmap = False     # shade with probe texel colors (no per-dir resample)
    cfg.tpu.ray_block = 8192           # static ray block size for jitted renders
    cfg.tpu.frame_fuse = False         # fuse grid bake + sweep + all ray blocks
                                       # into ONE executable per frame (lax.scan
                                       # over blocks, power-of-2 block buckets);
                                       # removes the per-block host dispatches
                                       # that idle the chip over the tunnel
    cfg.tpu.volume_cull = 0            # keep K of n_samples per ray (0 = exact):
                                       # MLP+KNN run only on the K samples nearest
                                       # the surface per a baked HDQ grid proxy
    cfg.tpu.volume_grid = 128          # bake res (longest axis) for volume culling
    cfg.tpu.donate = True
    cfg.tpu.profile_dir = ''

    return cfg
