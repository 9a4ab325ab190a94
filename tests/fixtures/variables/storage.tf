module "bucket" {
  source = "./modules/bucket"
  name   = var.bucket_name
}
