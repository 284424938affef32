"""gtsam_petercdev_tpu.utils"""
