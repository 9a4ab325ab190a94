locals {
  owner       = "platform-team"
  az          = "us-west-2a"
  name_prefix = "acme"
  chain_base  = "x"
  budget      = 100
}

locals {
  helper = "${local.chain_base}-h"
}

resource "aws_instance" "web" {
  ami               = "ami-12345678"
  availability_zone = local.az
  tags = {
    Owner = local.owner
  }
}

output "owner_tag" {
  value = local.owner
}
