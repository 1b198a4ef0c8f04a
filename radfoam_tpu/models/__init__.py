from radfoam_tpu.models.scene import RadFoamScene, activate_attributes

__all__ = ["RadFoamScene", "activate_attributes"]
