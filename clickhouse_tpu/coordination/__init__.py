from .keeper import Keeper, KeeperError, NoNodeError, NodeExistsError, \
    get_keeper, reset_keepers

__all__ = ["Keeper", "KeeperError", "NoNodeError", "NodeExistsError",
           "get_keeper", "reset_keepers"]
