"""gtsam_petercdev_tpu.ops"""
