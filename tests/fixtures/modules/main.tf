# Module-pinning audit corpus (separate from the main fixture corpus so
# the tf_* golden oracles over config/ stay untouched): one module per
# pinning class the documented workflow distinguishes
# (docs/tables/terraform_module.md:52-57 — split_part(module_source,
# '=', -1) + a leading-digit regex on the extracted git ref).

module "vpc" {
  source  = "terraform-aws-modules/vpc/aws"
  version = "5.0.0"
  cidr    = "10.0.0.0/16"
}

module "net" {
  source = "git::https://gitlab.com/acme/network.git?ref=v2.1.0"
}

module "app" {
  source = "git::https://gitlab.com/acme/app.git?ref=main"
}

module "local_tools" {
  source = "./modules/tools"
}

module "registry_latest" {
  source = "terraform-aws-modules/s3-bucket/aws"
}
