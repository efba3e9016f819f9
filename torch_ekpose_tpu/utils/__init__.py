from torch_ekpose_tpu.utils.human import BodyPart, Human, draw_humans

__all__ = ["BodyPart", "Human", "draw_humans"]
