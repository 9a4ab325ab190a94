module "bucket" {
  source = "./modules/bucket"
  name   = "${local.name_prefix}-data"
}
