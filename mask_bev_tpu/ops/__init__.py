from mask_bev_tpu.ops.voxelize import PillarBatch, pillarize, pillarize_batch  # noqa: F401
