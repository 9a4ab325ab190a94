# Edge-case corpus: heredocs, numerics, dynamic blocks, repeated nested
# blocks, conditionals, for-expressions, splats, indexing.

resource "aws_iam_role" "r" {
  name               = "app-role"
  assume_role_policy = <<EOF
{
  "Version": "2012-10-17",
  "Statement": [{"Effect": "Allow", "Action": "sts:AssumeRole"}]
}
EOF
  max_session_duration = 3600
}

resource "aws_autoscaling_group" "asg" {
  min_size         = 0
  max_size         = 10
  desired_capacity = var.env == "prod" ? 10 : 2
  spot_price       = 0.0042
  adjustment       = -3
  vpc_zone_identifier = module.vpc.private_subnets[*]
  tag {
    key   = "Name"
    value = "asg"
  }
  tag {
    key   = "env"
    value = var.env
  }
  dynamic "ebs" {
    for_each = var.disks
    content {
      size = ebs.value
    }
  }
}

resource "aws_instance" "indexed" {
  ami       = var.amis["us-west-2"]
  subnet_id = element(module.vpc.private_subnets, 0)
  count     = 0
}

variable "env" {
  type    = string
  default = "dev"
}

variable "disks" {
  type    = list(number)
  default = [100, 200.5]
}

output "subnet_ids" {
  value = [for s in module.vpc.private_subnets : s]
}
