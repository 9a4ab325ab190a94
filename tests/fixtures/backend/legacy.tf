terraform {
  # no encrypt flag: state lands unencrypted at rest — the finding this
  # audit exists to surface
  backend "s3" {
    bucket = "acme-tf-state"
    key    = "legacy/terraform.tfstate"
    region = "us-east-1"
  }
}
