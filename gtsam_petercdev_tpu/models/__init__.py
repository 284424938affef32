"""gtsam_petercdev_tpu.models"""
