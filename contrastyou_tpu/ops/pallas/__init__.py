from .infonce import fused_sup_con_loss

__all__ = ["fused_sup_con_loss"]
