"""gtsam_petercdev_tpu.sfm"""
