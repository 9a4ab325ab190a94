variable "region" {
  type    = string
  default = "us-west-2"
}

locals {
  prefix = "acme"
}

module "net" {
  source = "./modules/net"
}

resource "aws_instance" "web" {
  ami               = "ami-12345678"
  availability_zone = "${var.region}a"
  subnet_id         = module.net.subnet_id
  instance_type     = var.instance_typo
  tags = {
    Name = "${local.prefix}-web"
    Zone = local.zone_missing
  }
}

output "bucket" {
  value = module.ghost.bucket_arn
}
