from highresnet_tpu.utils.imageio import imread_u16, imsave_u16, img_as_float32, img_as_uint16

__all__ = ["imread_u16", "imsave_u16", "img_as_float32", "img_as_uint16"]
